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

  test("pull codec lands in the parquet footers (compression negotiation)") {
    val tmp = Files.createTempDirectory("xfer_codec").toString
    Transfer.pull(spark, src, s"$tmp/db", s"$tmp/manifest.json",
      tables = Seq("nation"), codec = "gzip")
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(s"$tmp/db/nation.parquet")
    val part = p.getFileSystem(conf).listStatus(p)
      .filter(s => s.getPath.getName.endsWith(".parquet")).head
    val r = ParquetFileReader.open(HadoopInputFile.fromStatus(part, conf))
    try {
      val codecs = r.getFooter.getBlocks.asScala
        .flatMap(_.getColumns.asScala.map(_.getCodec.name())).toSet
      assert(codecs == Set("GZIP"), s"expected GZIP everywhere, saw $codecs")
    } finally r.close()
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

  test("pull never reads the destination back (metrics ride the write pass)") {
    val tmp = Files.createTempDirectory("xfer").toString
    val dst = s"$tmp/db"
    val plans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             d: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val results = try {
      val r = Transfer.pull(spark, src, dst, s"$tmp/manifest.json",
        tables = Seq("region", "nation", "orders"))
      // ExecutionListenerBus is async — wait for the three write executions
      val deadline = System.currentTimeMillis() + 30000
      while (plans.size() < 3 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      r
    } finally spark.listenerManager.unregister(listener)
    assert(results.forall(!_.skipped))
    // counts and watermarks still produced (now from df.observe, not a re-read)
    val orders = results.find(_.table == "orders").get
    assert(orders.rows == 1500 && orders.watermark.exists(_ > 0))
    // no execution may SCAN the destination; the write commands mention the
    // dest path as their output, so look specifically for file scans of it
    import scala.jdk.CollectionConverters._
    val destScans = plans.asScala.filter(_.linesIterator.exists(l =>
      l.contains("FileScan") && l.contains(dst)))
    assert(destScans.isEmpty, s"destination was read back:\n${destScans.mkString("\n---\n")}")
  }

  test("chunked pull: killed mid-table, resume never rewrites completed ranges") {
    val tmp = Files.createTempDirectory("xfer").toString
    val dst = s"$tmp/db"
    val mpath = s"$tmp/manifest.json"
    // move only 2 of 4 ranges — the moral equivalent of a crash mid-table
    val first = Transfer.pullChunked(spark, src, dst, mpath, "orders",
      chunks = 4, maxChunks = 2)
    assert(first.size == 2 && first.map(_.table) == Seq("orders/0", "orders/1"))
    val m1 = streaming.Manifest.load(mpath)
    assert(m1.isCompleted("orders/0") && m1.isCompleted("orders/1")
      && !m1.isCompleted("orders/2") && !m1.isCompleted("orders"))
    val chunk0 = java.nio.file.Paths.get(s"$dst/orders.parquet/chunk_id=0")
    def fileTimes(p: java.nio.file.Path): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      Files.list(p).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(f => f.getFileName.toString -> Files.getLastModifiedTime(f).toMillis)
        .toMap
    }
    val before = fileTimes(chunk0)
    assert(before.nonEmpty)
    // resume: finishes ranges 2..3 only
    val second = Transfer.pullChunked(spark, src, dst, mpath, "orders", chunks = 4)
    assert(second.map(_.table) == Seq("orders/2", "orders/3"))
    assert(fileTimes(chunk0) == before, "completed range was rewritten on resume")
    // table now complete: content matches the source, table-level key present
    val m2 = streaming.Manifest.load(mpath)
    assert(m2.isCompleted("orders") && m2.watermark("orders").exists(_ > 0))
    val moved = spark.read.parquet(s"$dst/orders.parquet")
    val srcOrders = Tables.load(spark, src, "orders")
    assert(moved.count() == srcOrders.count())
    assert(moved.select("o_orderkey").except(srcOrders.select("o_orderkey")).count() == 0)
    // a third invocation has nothing to do
    assert(Transfer.pullChunked(spark, src, dst, mpath, "orders", chunks = 4).isEmpty)
  }

  test("pull runs tables concurrently; pullToJdbc does too (SURVEY §4 headroom)") {
    // barrier proof: every per-table task must be IN FLIGHT at once for the
    // barrier to release — a sequential loop parks the first task until the
    // 30 s timeout breaks the barrier and fails the transfer
    import java.util.concurrent.{CyclicBarrier, TimeUnit}
    val tables = Seq("region", "nation", "supplier")
    def withBarrier[A](body: => A): A = {
      val barrier = new CyclicBarrier(tables.size)
      Transfer.tableStartHook = _ => barrier.await(30, TimeUnit.SECONDS)
      try body finally Transfer.tableStartHook = _ => ()
    }
    val tmp = Files.createTempDirectory("xfer_par").toString
    val pulled = withBarrier {
      Transfer.pull(spark, src, s"$tmp/db", s"$tmp/manifest.json",
        tables = tables, parallelism = tables.size)
    }
    assert(pulled.map(_.table).toSet == tables.toSet && pulled.forall(!_.skipped))
    val loaded = withBarrier {
      Transfer.pullToJdbc(spark, src, "jdbc:derby:memory:graft_par;create=true",
        tables, parallelism = tables.size)
    }
    assert(loaded.map(_.table).toSet == tables.toSet && loaded.forall(_.rows > 0))
  }

  test("plan subtracts regex filter, excludes, and completed set like taps") {
    val m = streaming.Manifest.empty.complete("nation", 25L)
    val p = Transfer.plan(Tables.names, Some("ion"), Seq("region"), m)
    assert(p == Seq()) // "ion" matches region+nation; region excluded, nation done
    val p2 = Transfer.plan(Tables.names, None, Seq("events"), m)
    assert(!p2.contains("nation") && !p2.contains("events") && p2.contains("orders"))
  }
}
