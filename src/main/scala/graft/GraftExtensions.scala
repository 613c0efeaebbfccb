package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.CosineSim

/**
 * SparkSessionExtensions entry point: registers graft's native expressions
 * into the session's FunctionRegistry so they're callable from SQL
 * (`SELECT cosine_sim(a.embedding, b.embedding) FROM ...`), and graft's
 * optimizer rules (the range-join rewrite — armed per session by
 * `spark.graft.rangeJoin.binWidth`, inert otherwise).
 *
 * Wire up with:
 *   SparkSession.builder().withExtensions(new GraftExtensions) — in code, or
 *   --conf spark.sql.extensions=graft.GraftExtensions     — cluster-wide.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(children(0), children(1))))
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
  }
}
