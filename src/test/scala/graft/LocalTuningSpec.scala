package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the local-run shuffle tuning ([[LocalTuning]]) actually reaching
  * the session: the serialized sort shuffle writer (the at-scale writer —
  * bypass would open one file per reduce partition per map task and this
  * container serializes file creates), and tmpfs scratch when /dev/shm
  * has headroom. The shared test session is built through LocalTuning, so
  * asserting on ITS conf covers the real wiring. */
class LocalTuningSpec extends AnyFunSuite with SparkSpec {

  test("serialized shuffle writer is pinned (bypass threshold 1)") {
    assert(spark.sparkContext.getConf
      .get("spark.shuffle.sort.bypassMergeThreshold") == "1")
  }

  test("shuffle scratch lands on tmpfs when /dev/shm has headroom") {
    val shm = new java.io.File("/dev/shm")
    assume(shm.isDirectory && shm.canWrite && shm.getUsableSpace >= (16L << 30),
      "host has no roomy /dev/shm — fallback path in play")
    assert(spark.sparkContext.getConf.get("spark.local.dir") == "/dev/shm/graft-local")
  }

  test("builder does not die when tmpfs is unavailable (fallback is None)") {
    // the guard itself: a second builder on the live session must not throw
    // regardless of /dev/shm state, and the existing session keeps working
    val b = LocalTuning(org.apache.spark.sql.SparkSession.builder())
    assert(b != null)
    assert(spark.range(10).count() == 10)
  }
}
