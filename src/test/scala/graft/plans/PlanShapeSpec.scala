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

  test("whole-stage codegen covers the hot aggregation path") {
    val p = SparkEntry.queries("agg_group_returnflag")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode)
    assert(p.contains("WholeStageCodegen"), s"expect WholeStageCodegen subtrees:\n${p.take(800)}")
  }
}
