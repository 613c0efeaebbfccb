package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end database transfer at sf0.001 — the reference's core workload
  * (pull → verify → resume), Parquet-to-Parquet. */
class TransferSpec extends AnyFunSuite with SparkSpec {

  private val src = "/root/testdata/sf0.001"

  test("full pull moves every table; verify matches row counts") {
    val tmp = Files.createTempDirectory("xfer").toString
    val results = Transfer.pull(spark, src, s"$tmp/db", s"$tmp/manifest.json")
    assert(results.size == Tables.names.size && results.forall(!_.skipped))
    val v = Transfer.verifyTransfer(spark, src, s"$tmp/db").collect()
    assert(v.forall(_.getBoolean(3)), v.mkString("\n"))
    // single-int-pk tables recorded a real watermark
    val orders = results.find(_.table == "orders").get
    assert(orders.watermark.isDefined && orders.watermark.get > 0)
  }

  test("resume skips completed tables (P8) and re-runs converge (T3 idempotence)") {
    val tmp = Files.createTempDirectory("xfer").toString
    val first = Transfer.pull(spark, src, s"$tmp/db", s"$tmp/manifest.json",
      tables = Seq("region", "nation"))
    assert(first.count(!_.skipped) == 2)
    // second run with a wider plan: completed tables skip, new ones move
    val second = Transfer.pull(spark, src, s"$tmp/db", s"$tmp/manifest.json",
      tables = Seq("region", "nation", "customer"))
    assert(second.count(_.skipped) == 2)
    assert(second.count(!_.skipped) == 1)
    assert(spark.read.parquet(s"$tmp/db/customer.parquet").count() > 0)
  }

  test("plan subtracts regex filter, excludes, and completed set like taps") {
    val m = streaming.Manifest.empty.complete("nation", 25L)
    val p = Transfer.plan(Tables.names, Some("ion"), Seq("region"), m)
    assert(p == Seq()) // "ion" matches region+nation; region excluded, nation done
    val p2 = Transfer.plan(Tables.names, None, Seq("events"), m)
    assert(!p2.contains("nation") && !p2.contains("events") && p2.contains("orders"))
  }
}
