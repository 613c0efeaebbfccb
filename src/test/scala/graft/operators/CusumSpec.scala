package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSpec, SparkEntry}

/** Pins the WINDOWED CUSUM identity the `ext_cusum_drift` query runs
  * (s_i = P_i − min(0, min_{j≤i} P_j) over fixed-point prefix sums)
  * against the textbook RECURSIVE definition
  * s_i = max(0, s_{i−1} + (x_i − k)) folded in Scala — same fixture,
  * same 2^20 quantization, same threshold-crossing count. */
class CusumSpec extends AnyFunSuite with SparkSpec {

  test("windowed CUSUM identity equals the recursive fold, per user, " +
      "including max and threshold crossings (sf0.001 events)") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("ext_cusum_drift")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val rows = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"),
        expr("CAST(floor(coalesce(value, 0.0) * 1048576 + 0.5) AS BIGINT)" +
          " - 62914560").as("dq"),
        row_number().over(w).as("rn"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

    val h = 262144000L
    val want = rows.groupBy(_._1).map { case (user, rs) =>
      var s = 0L
      var mx = 0L
      var prev = 0L
      var crossings = 0L
      rs.sortBy(_._3).foreach { case (_, dq, _) =>
        s = math.max(0L, s + dq)
        if (s >= h && prev < h) crossings += 1
        if (s > mx) mx = s
        prev = s
      }
      user -> ((rs.length.toLong, mx, crossings))
    }
    assert(got == want)
    // the fixture must actually exercise both sides of the threshold,
    // or the crossing count is vacuous
    assert(got.values.exists(_._3 > 0), "no user ever crossed h")
    assert(got.values.exists(_._2 < h), "every user maxed over h")
  }
}
