package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Bloom-pruned joins: exactness vs the plain join, actual pruning power,
  * and the degenerate edges (empty build side, null keys). */
class PruneSpec extends AnyFunSuite with SparkSpec {

  private lazy val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
  private lazy val supp = graft.Tables.load(spark, "/root/testdata/sf0.001", "supplier")

  test("bloomPrunedJoin result EQUALS the plain join (FP-only, no FN)") {
    val dim = supp.filter(col("s_nationkey") === 3)
    val plain = li.join(dim, li("l_suppkey") === dim("s_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val pruned = Prune.bloomPrunedJoin(li, dim, "l_suppkey", "s_suppkey")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(plain.nonEmpty && pruned == plain)
  }

  test("semi-filter actually prunes: survivors ≪ fact rows, ⊇ true matches") {
    val dim = supp.filter(col("s_nationkey") === 3)
    val factN = li.count()
    val trueN = li.join(dim, li("l_suppkey") === dim("s_suppkey")).count()
    val survivors = Prune.bloomSemiFilter(li, col("l_suppkey"),
      dim, col("s_suppkey")).count()
    assert(survivors >= trueN, "false negatives are impossible by contract")
    // a handful of suppliers out of 10 ⇒ the filter must cut most rows
    assert(survivors < factN / 2, s"no pruning: $survivors of $factN")
  }

  test("empty build side prunes everything") {
    val dim = supp.filter(col("s_nationkey") === -1)
    assert(dim.count() == 0)
    assert(Prune.bloomSemiFilter(li, col("l_suppkey"),
      dim, col("s_suppkey")).count() == 0)
  }

  test("null fact keys never crash and never survive the real join") {
    import spark.implicits._
    val fact = Seq(Some(1L), None, Some(99L)).toDF("k")
    val dim = Seq(1L).toDF("dk")
    val out = Prune.bloomPrunedJoin(fact, dim, "k", "dk")
      .select(col("k")).collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L))
  }
}
