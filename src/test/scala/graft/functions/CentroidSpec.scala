package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** §2.10 UDAF surface: the typed centroid Aggregator. */
class CentroidSpec extends AnyFunSuite with SparkSpec {

  test("centroid is the element-wise mean, partial-merge safe across partitions") {
    val sq = spark
    import sq.implicits._
    val df = Seq(
      ("a", Seq(1.0f, 0.0f)),
      ("a", Seq(3.0f, 2.0f)),
      ("b", Seq(10.0f, 10.0f)),
    ).toDF("k", "v").repartition(4) // force multi-partition partials
    val out = df.groupBy("k").agg(Centroid.centroid(col("v")).as("c"))
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(out("a") == Seq(2.0f, 1.0f))
    assert(out("b") == Seq(10.0f, 10.0f))
  }

  test("empty and null inputs degrade gracefully") {
    val sq = spark
    import sq.implicits._
    val df = Seq(("a", null.asInstanceOf[Seq[Float]])).toDF("k", "v")
    val out = df.groupBy("k").agg(Centroid.centroid(col("v")).as("c")).collect()
    assert(out.head.getSeq[Float](1).isEmpty)
  }

  test("approx_count_distinct tracks exact distinct within its rsd (A6)") {
    val orders = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val exact = orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val approx = orders.select(approx_count_distinct(col("o_custkey"), 0.05)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }

  test("CentroidFixed is bit-identical under ANY partitioning (merge-order-free)") {
    // the property that makes IVF training oracle-expressible: integer
    // fixed-point partial sums commute, so the merge tree cannot change the
    // result — unlike double sums, which drift by fold order. Compare the
    // same aggregation under 1, 3, and 16 partitions, bit-for-bit.
    val sq = spark
    import sq.implicits._
    val rows = (0 until 300).map { i =>
      (s"g${i % 4}", Seq.tabulate(8)(d => ((i * 31 + d * 7) % 997 - 498).toFloat / 167f))
    }
    def centroids(parts: Int): Map[String, Seq[Float]] =
      rows.toDF("k", "v").repartition(parts)
        .groupBy("k").agg(CentroidFixed.centroid(col("v")).as("c"))
        .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    val one = centroids(1)
    assert(centroids(3) == one && centroids(16) == one,
      "fixed-point centroid must not depend on the partition/merge tree")
    // and it equals the independently-computed exact fixed-point mean
    val expect = rows.filter(_._1 == "g0").map(_._2)
    val n = expect.size
    val manual = (0 until 8).map { d =>
      val s = expect.map(v => math.floor(v(d).toDouble * 1048576.0 + 0.5).toLong).sum
      (s.toDouble / (n * 1048576.0)).toFloat
    }
    assert(one("g0") == manual)
  }
}
