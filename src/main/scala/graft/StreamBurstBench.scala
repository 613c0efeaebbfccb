package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** ADVERSARIAL streaming scenario (r16 verdict #8): [[StreamBench]]'s
  * envelope is the happy path (uniform arrival, state well under every
  * bound); this main drives the worst case the dedup-on-ingest design
  * must survive — a CLONE FLOOD. One text repeated `clones` times lands
  * every row in the SAME two band buckets inside one 2-minute event-time
  * window, so neither the watermark (no time passes) nor bucket
  * diversity (no spread) relieves the state store: only the
  * `maxBucketDocs` cap stands between the burst and unbounded state.
  *
  * Properties ASSERTED (the run fails loudly, not just reports):
  *  - BOUNDED STATE: peak state bytes stay under a hard ceiling that a
  *    capless bucket (600 × sig-array rows) would blow through, and the
  *    bucket cap keeps per-bucket rows at `maxBucketDocs`;
  *  - NO DROPPED FLAGS: every clone after the group's first is flagged
  *    against SOME earlier clone — the cap evicts old state rows but can
  *    never lose a flag, because any retained clone still matches;
  *  - EVICTION UNDER PRESSURE: a drain phase advances the watermark past
  *    the burst window and the burst buckets' bytes leave the store
  *    (final bytes ≪ peak);
  *  - LATE-BEYOND-CONTRACT: a probe clone event-timed inside the burst
  *    window but arriving after the watermark passed it emits NOTHING —
  *    dropped at ingest by the watermark, not half-processed.
  *
  * One JSON line on stdout + `stream_bench_burst.json` (Bench
  * convention). Fixture-free: the burst is synthesized (deterministic
  * ids/timestamps), so the scenario runs identically at any SF. */
object StreamBurstBench {
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

    val clones = sys.env.getOrElse("SPARK_GRAFT_BURST_CLONES", "600").toInt
    val batch = sys.env.getOrElse("SPARK_GRAFT_BURST_BATCH", "150").toInt
    val cap = sys.env.getOrElse("SPARK_GRAFT_BURST_CAP", "128").toInt
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = streaming.Streams.nearDupStream(docs, "ts", "doc_id", "text",
        lateness = "10 minutes", maxBucketDocs = cap)
      .writeStream.format("memory").queryName("neardup_burst")
      .outputMode("append").start()

    val t0 = 1600000000000L
    val cloneText = "the same boilerplate license header every mirror ships"
    // phase 1 — the flood: `clones` rows of ONE text, 100 ms apart in
    // event time (whole burst inside 2 min ≪ the 10 min lateness)
    val burst = (0 until clones).map(i =>
      (new Timestamp(t0 + i * 100L), 10000000L + i, cloneText))
    val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stateBytes = scala.collection.mutable.ArrayBuffer.empty[Long]
    def pump(rows: Seq[(Timestamp, Long, String)]): Unit =
      rows.grouped(batch).foreach { b =>
        mem.addData(b)
        q.processAllAvailable()
        val so = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
        stateRows += so.map(_.numRowsTotal).sum
        stateBytes += so.map(_.memoryUsedBytes).sum
      }
    val tAll = System.nanoTime()
    pump(burst)
    val burstBytesPeak = stateBytes.max
    val hitsAfterBurst = sq.sql("SELECT count(*) FROM neardup_burst")
      .head().getLong(0)
    // NO DROPPED FLAGS: every clone but the first appears on the later
    // side of at least one hit, cap or no cap
    val flagged = sq.sql(
      "SELECT count(DISTINCT doc_id) FROM neardup_burst " +
      "WHERE doc_id > 10000000").head().getLong(0)
    val flagsMissing = (clones - 1) - flagged
    require(flagsMissing == 0,
      s"$flagsMissing clones lost their near-dup flag under the cap")
    // BOUNDED STATE: a capless burst bucket would hold `clones` sig
    // arrays (16 × 8 B each + row overhead) in each of 2 bands; assert
    // the store stays under half that, and under a hard 32 MB ceiling
    val caplessLowerBound = 2L * clones * 16 * 8
    require(burstBytesPeak < (32L << 20) &&
      burstBytesPeak < caplessLowerBound / 2,
      s"state peak $burstBytesPeak >= half capless bound ${caplessLowerBound / 2}")

    // phase 2 — drain: a handful of unique texts 15 min later. The first
    // batch advances the watermark past burst-end + lateness; timeouts
    // fire on the NEXT batch, so a second batch triggers the eviction.
    // Kept tiny on purpose: the burst bucket's capped doc lists must
    // leave the store, and a big drain would re-fill it with its own
    // per-group overhead and mask the drop.
    def drainRow(i: Int) =
      (new Timestamp(t0 + 15 * 60 * 1000L + i * 2000L), 20000000L + i,
        s"unique document number $i with its own words")
    pump((0 until 4).map(drainRow))
    pump((4 until 8).map(drainRow))
    val bytesFinal = stateBytes.last
    require(bytesFinal < burstBytesPeak / 2,
      s"burst buckets not evicted: final $bytesFinal vs peak $burstBytesPeak")

    // phase 3 — late-beyond-contract probe: event time inside the burst
    // window, arriving now (watermark long past) → zero new hits
    val hitsBeforeProbe = sq.sql("SELECT count(*) FROM neardup_burst")
      .head().getLong(0)
    pump(Seq((new Timestamp(t0 + 1000L), 30000000L, cloneText)))
    val hitsAfterProbe = sq.sql("SELECT count(*) FROM neardup_burst")
      .head().getLong(0)
    val lateProbeHits = hitsAfterProbe - hitsBeforeProbe
    require(lateProbeHits == 0,
      s"late-beyond-watermark row produced $lateProbeHits hits")
    val totalSec = (System.nanoTime() - tAll) / 1e9
    q.stop()

    def s3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val json =
      s"""{"metric":"neardup_stream_burst","clones":$clones,"batch_size":$batch,""" +
      s""""max_bucket_docs":$cap,"total_sec":${s3(totalSec)},""" +
      s""""hits_burst":$hitsAfterBurst,"flags_missing":$flagsMissing,""" +
      s""""state_bytes_peak":$burstBytesPeak,"capless_lower_bound":$caplessLowerBound,""" +
      s""""state_bytes_final":$bytesFinal,"state_rows_max":${stateRows.max},""" +
      s""""late_probe_hits":$lateProbeHits,"all_asserts":"passed"}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_STREAM_BURST_OUT",
      "stream_bench_burst.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[stream-burst] could not write $outFile: ${e.getMessage}") }
    println(json)
    spark.stop()
  }
}
