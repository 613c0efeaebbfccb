package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Micro-bench for the STREAMING near-dup path (r15 verdict #8): drives
  * the fixture corpus through [[streaming.Streams.nearDupStream]] in
  * MemoryStream micro-batches and records the numbers the dedup-on-ingest
  * claim was missing — per-batch wall, end-to-end docs/sec, emitted hits,
  * and the state-store envelope (rows + bytes from the progress stream)
  * under watermark eviction. One JSON line on stdout (the Bench
  * convention) + `stream_bench_out.json`.
  *
  * Shape notes: docs arrive 1/sec in event time in `batch`-sized
  * micro-batches, lateness 10 min — so the bucket state holds ≈600 docs
  * per band window and the watermark actively evicts across the run
  * (state growth is the thing to watch; an unbounded-state stream would
  * show monotone numRowsTotal). The corpus-sized driver collect is bench
  * harness, not engine. */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val spark = LocalTuning(org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batch = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCH", "500").toInt
    val corpus = Tables.load(spark, sfDir, "documents")
      .select($"doc_id".cast("long"), $"text").as[(Long, String)]
      .collect()

    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = streaming.Streams.nearDupStream(docs, "ts", "doc_id", "text",
        lateness = "10 minutes")
      .writeStream.format("memory").queryName("neardup_bench")
      .outputMode("append").start()

    val t0epoch = 1600000000000L
    val batches = corpus.zipWithIndex
      .map { case ((id, txt), i) => (new Timestamp(t0epoch + i * 1000L), id, txt) }
      .grouped(batch).toVector
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Double]
    val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stateBytes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val tAll = System.nanoTime()
    batches.foreach { b =>
      val t = System.nanoTime()
      mem.addData(b.toSeq)
      q.processAllAvailable()
      perBatch += (System.nanoTime() - t) / 1e9
      val so = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
      stateRows += so.map(_.numRowsTotal).sum
      stateBytes += so.map(_.memoryUsedBytes).sum
    }
    val totalSec = (System.nanoTime() - tAll) / 1e9
    val hits = sq.sql("SELECT count(*) FROM neardup_bench").head().getLong(0)
    q.stop()

    def s3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // steady state excludes the first micro-batch (janino + state-store init)
    val steady = if (perBatch.size > 1) perBatch.tail else perBatch.toSeq
    val json =
      s"""{"metric":"neardup_stream","docs":${corpus.length},"batch_size":$batch,""" +
      s""""batches":${batches.size},"total_sec":${s3(totalSec)},""" +
      s""""docs_per_sec":${s3(corpus.length / totalSec)},""" +
      s""""docs_per_sec_steady":${s3(
        (corpus.length - math.min(batch, corpus.length)) /
          math.max(steady.sum, 1e-9))},""" +
      s""""batch_sec_first":${s3(perBatch.head)},""" +
      s""""batch_sec_median":${s3(perBatch.sorted.apply(perBatch.size / 2))},""" +
      s""""hits":$hits,"state_rows_max":${if (stateRows.isEmpty) 0 else stateRows.max},""" +
      s""""state_bytes_max":${if (stateBytes.isEmpty) 0 else stateBytes.max},""" +
      s""""state_rows_final":${stateRows.lastOption.getOrElse(0L)},"sf":"$sfDir"}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_STREAM_BENCH_OUT",
      "stream_bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[stream-bench] could not write $outFile: ${e.getMessage}") }
    println(json)
    spark.stop()
  }
}
