package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.{CosineSim, DistinctTokens, SimHash64, TokenSetHashes, TokenTfPairs, WordGramHashes}

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
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("token_set_hashes"),
      new ExpressionInfo(classOf[TokenSetHashes].getName, "token_set_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TokenSetHashes(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("word_gram_hashes"),
      new ExpressionInfo(classOf[WordGramHashes].getName, "word_gram_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"word_gram_hashes requires exactly 2 arguments (text, n), got ${children.length}")
        WordGramHashes(children.head, children(1) match {
          // integral literal types only: a fractional literal (2.5) would
          // silently truncate through Number.intValue
          case org.apache.spark.sql.catalyst.expressions.Literal(n: Byte, _) => n.toInt
          case org.apache.spark.sql.catalyst.expressions.Literal(n: Short, _) => n.toInt
          case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) => n
          case org.apache.spark.sql.catalyst.expressions.Literal(n: Long, _)
            if n.isValidInt => n.toInt
          case other => throw new IllegalArgumentException(
            "word_gram_hashes: n must be a non-null INTEGRAL literal " +
              s"(constant expressions are not folded at resolution time), got $other")
        })
      }))
    ext.injectFunction((
      new FunctionIdentifier("token_tf_pairs"),
      new ExpressionInfo(classOf[TokenTfPairs].getName, "token_tf_pairs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 1) throw new IllegalArgumentException(
          s"token_tf_pairs requires exactly 1 argument (text), got ${children.length}")
        TokenTfPairs(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("distinct_tokens"),
      new ExpressionInfo(classOf[DistinctTokens].getName, "distinct_tokens"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 1) throw new IllegalArgumentException(
          s"distinct_tokens requires exactly 1 argument (text), got ${children.length}")
        DistinctTokens(children.head)
      }))
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
  }
}
