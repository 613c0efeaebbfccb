package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSpec, SparkEntry}

/** Scale-shape assertions on the physical plans of headline queries: these
  * pin the properties that matter at 1000 executors, not just the results. */
class PlanShapeSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("star join: dims broadcast BY HINT, fact join shuffles when nothing auto-broadcasts") {
    // at real scale nothing is under the auto-broadcast threshold; simulate by
    // disabling it — the explicit broadcast() hints must still carry the dims,
    // and the lineitem⋈orders fact join must become a shuffle join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = planOf("join_star_5way")
      assert(p.contains("BroadcastHashJoin"), s"hinted dims must broadcast:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"fact join must be a shuffle join:\n$p")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("grouped aggregation is two-phase (partial map-side combine)") {
    val p = planOf("agg_group_returnflag")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"expect partial+final:\n$p")
  }

  test("projection pruning reaches the scan (ReadSchema excludes unused columns)") {
    val p = planOf("project_header_order")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("c_custkey") && !read.contains("c_nationkey"),
      s"scan must prune to the projected columns:\n$read")
  }

  test("keyset watermark predicate is pushed to the Parquet scan") {
    val p = planOf("scan_keyset_chunk")
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(o_orderkey,5000)"),
      s"watermark must push down:\n$p")
  }

  test("top-k plans as TakeOrderedAndProject (no global sort materialization)") {
    val p = planOf("topk_orders_by_price")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must be a heap merge:\n$p")
  }

  test("distributed ntile matches the built-in and avoids the single-partition window") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val orders = graft.Tables.load(spark, sf, "orders").select(col("o_orderkey"))
    val builtin = orders.select(col("o_orderkey"),
      ntile(4).over(Window.orderBy(col("o_orderkey"))).as("quartile"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val twoPhase = SparkEntry.queries("window_ntile_orders")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(twoPhase == builtin && twoPhase.nonEmpty)
    val p = planOf("window_ntile_orders")
    assert(!p.contains("SinglePartition"), s"ntile must not funnel to one task:\n$p")
    assert(!p.contains("Window"), s"two-phase ntile needs no window exec:\n$p")
  }

  test("distributed ntile: uneven buckets match the built-in (N % n != 0)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val sq = spark
    import sq.implicits._
    // 10 rows into 4 buckets → sizes 3,3,2,2; also exercises n=3 (10%3=1)
    val df = (1 to 10).map(_.toLong).toDF("k").repartition(4)
    for (n <- Seq(3, 4, 7, 10, 12)) {
      val builtin = df.select(col("k"), ntile(n).over(Window.orderBy(col("k"))).as("t"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      val twoPhase = graft.operators.Query.ntileDistributed(df, n, Seq("k"), "t")
        .select(col("k"), col("t"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      assert(twoPhase == builtin, s"n=$n")
    }
  }

  test("whole-stage codegen covers the hot aggregation path") {
    val p = SparkEntry.queries("agg_group_returnflag")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode)
    assert(p.contains("WholeStageCodegen"), s"expect WholeStageCodegen subtrees:\n${p.take(800)}")
  }
}
