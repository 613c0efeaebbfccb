package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketed layout → shuffle-free equi-joins: the destination-side
  * optimization that replaces taps' secondary-index replay at scale. */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("join of co-bucketed tables has NO shuffle exchange on either side") {
    Transfer.writeBucketed(Tables.load(spark, sf, "orders"), "b_orders",
      "o_custkey", 4, sortCols = Seq("o_custkey"))
    Transfer.writeBucketed(Tables.load(spark, sf, "customer"), "b_customer",
      "c_custkey", 4, sortCols = Seq("c_custkey"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucket-to-bucket join must not shuffle:\n$plan")
      // and the result is still correct
      val expected = Tables.load(spark, sf, "orders")
        .join(Tables.load(spark, sf, "customer"),
          col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed aggregation on the bucket key also avoids the shuffle") {
    val agg = spark.table("b_orders").groupBy("o_custkey")
      .agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"group-by on the bucket column must not shuffle:\n$plan")
  }

  test("Layout.colocatedJoin: merge-hinted SMJ with zero Exchange below the " +
      "join, broadcast suppressed, correct result (the declared-query shape)") {
    import java.nio.file.Files
    val o = operators.Layout.ensureBucketed(spark,
      Tables.load(spark, sf, "orders"), "b2_orders", "o_custkey", 4,
      Files.createTempDirectory("graft_b2_o").toString)
    val c = operators.Layout.ensureBucketed(spark,
      Tables.load(spark, sf, "customer"), "b2_customer", "c_custkey", 4,
      Files.createTempDirectory("graft_b2_c").toString)
    // second call is metadata-only (idempotent), not a rewrite
    assert(operators.Layout.ensureBucketed(spark, fail("must not re-read"),
      "b2_orders", "o_custkey", 4, "/nonexistent") == "b2_orders")
    val joined = operators.Layout.colocatedJoin(spark, o, c,
      "o_custkey", "c_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"the merge hint must suppress the small-side broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"co-bucketed SMJ must not shuffle either side:\n$plan")
    // one file per bucket: the pre-write repartition pinned the layout
    assert(spark.table(o).inputFiles.length == 4)
    val expected = Tables.load(spark, sf, "orders")
      .join(Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey")).count()
    assert(joined.count() == expected && expected > 0)
  }
}
