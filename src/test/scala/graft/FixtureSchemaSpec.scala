package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Fixture-schema drift guard (VERDICT r8 task 3). The driver regenerated
  * the parquet fixture under the repo twice (events `ts`: TIMESTAMP(NANOS) →
  * TIMESTAMP_MICROS NTZ) and each time the first symptom was a lost round of
  * artifacts. This spec makes the NEXT drift a one-minute named failure:
  * every table's post-load logical schema must match [[Tables.expectedSchema]],
  * and a deliberately-doctored fixture must fail with the table/column named. */
class FixtureSchemaSpec extends AnyFunSuite with SparkSpec {

  test("all fixture tables match the pinned post-load schema at every SF") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val drift = Tables.schemaDrift(spark, s"/root/testdata/$sf")
      assert(drift.isEmpty, s"[$sf] fixture drift:\n  ${drift.mkString("\n  ")}")
    }
  }

  test("events ts normalizes to TimestampType from all accepted physical forms") {
    import org.apache.spark.sql.types._
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType == TimestampType)
    // NTZ form (what the current fixture carries) and a synthetic long form
    // both normalize to the same wall-clock values
    val viaLong = Tables.normalizeEventsTs(
      ev.withColumn("ts", unix_micros(col("ts")) * lit(1000L))) // µs→ns long
    assert(viaLong.schema("ts").dataType == TimestampType)
    val a = ev.select("event_id", "ts").orderBy("event_id").limit(50).collect()
    val b = viaLong.select("event_id", "ts").orderBy("event_id").limit(50).collect()
    assert(a.sameElements(b))
  }

  test("a doctored fixture fails with the table and column named") {
    val dir = java.nio.file.Files.createTempDirectory("doctored_fixture")
    for (t <- Tables.names) {
      val src = Tables.loadRaw(spark, "/root/testdata/sf0.001", t).limit(10)
      // doctor ONE column of one table: widen region.r_regionkey to long
      val out = if (t == "region") src.withColumn("r_regionkey", col("r_regionkey").cast("long")) else src
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val drift = Tables.schemaDrift(spark, dir.toString)
    assert(drift.exists(d => d.contains("region.r_regionkey") &&
      d.contains("got bigint") && d.contains("want int")), drift.mkString("; "))
    // events was round-tripped through the already-normalized form
    // (TimestampType) — the adaptive load must accept it silently
    assert(!drift.exists(_.startsWith("events")), drift.mkString("; "))
  }
}
