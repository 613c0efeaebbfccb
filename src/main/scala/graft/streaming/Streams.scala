package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/**
 * Structured-Streaming surface (SURVEY §2.9).
 *
 * taps is "streaming" in the incremental/resumable sense: a stateful cursor
 * per table, checkpointed after every chunk, at-least-once delivery with a
 * repair path (T1–T6). Spark-native, those semantics live in Structured
 * Streaming: checkpointed source offsets ≙ the pk watermark, idempotent
 * exactly-once file sinks ≙ the repair path, and graceful shutdown ≙ T6.
 *
 * Everything here is shaped for unbounded input: windowed aggregations carry
 * a watermark so state is bounded (old windows evict), and the custom
 * stateful operator uses [[GroupStateTimeout]] so abandoned keys expire.
 * At 100 TB/day the same code runs against Kafka/file sources — the
 * transforms are source-agnostic DataFrame combinators, also applicable in
 * batch mode (the driver's oracle runs [[tumblingCounts]]'s batch twin).
 */
object Streams {

  /** T7: tumbling event-time window counts with a watermark bounding state.
    * Batch twin: `stream_tumbling_counts` in SparkEntry. */
  def tumblingCounts(events: DataFrame, tsCol: String, lateness: String = "10 minutes",
                     width: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("n"), col("sum_value"))

  /** Sliding window variant (width, slide). */
  def slidingCounts(events: DataFrame, tsCol: String, width: String, slide: String,
                    lateness: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"), col("n"))

  /** Session windows per user: gap-based, the streaming analogue of taps'
    * per-table "activity until the cursor goes quiet". */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String, gap: String,
                    lateness: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, lateness)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("session_window.start").as("sess_start"), col("n"))

  /** Streaming exact dedup — X1's unbounded form: drop rows whose dedup key
    * was already seen within the watermark horizon
    * (`dropDuplicatesWithinWatermark`). State is BOUNDED: a key's entry
    * evicts once event time passes the lateness bound, which is the only
    * way exact dedup runs forever on an unbounded stream; duplicates that
    * recur across horizons are the residual a periodic batch pass
    * ([[graft.operators.Dedup.exact]]) cleans. Batch twin:
    * `dropDuplicates(keyCols)` (the `stream_dedup_keys` query). */
  def dedupStream(events: DataFrame, tsCol: String, keyCols: Seq[String],
                  lateness: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** The streaming form of taps' per-key cursor state (T1/T2): tracks, per
    * key, the high-water mark and row count seen so far — exactly what
    * `DataStreamKeyed` keeps in `state[:filter]`/`state[:offset]`
    * (reference `lib/taps/data_stream.rb:249-266`). */
  final case class CursorState(watermark: Long, rows: Long)
  final case class CursorUpdate(key: String, watermark: Long, rows: Long)

  /** mapGroupsWithState updater: merges a batch of (key, pk) rows into the
    * per-key cursor. With `idleTimeoutMs > 0`, ProcessingTimeTimeout evicts
    * keys idle past the bound — bounded state on unbounded keyspaces (the
    * production setting; timer-driven micro-batches keep firing to expire
    * state). `idleTimeoutMs <= 0` disables eviction (deterministic tests). */
  def trackCursors(input: Dataset[(String, Long)], idleTimeoutMs: Long = 3600000L)
                  (implicit enc1: org.apache.spark.sql.Encoder[CursorState],
                   enc2: org.apache.spark.sql.Encoder[CursorUpdate]): Dataset[CursorUpdate] = {
    val timeout =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    input.groupByKey(_._1)(org.apache.spark.sql.Encoders.STRING)
      .mapGroupsWithState[CursorState, CursorUpdate](timeout) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[CursorState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            CursorUpdate(key, s.watermark, s.rows)
          } else {
            val prev = state.getOption.getOrElse(CursorState(Long.MinValue, 0L))
            var wm = prev.watermark; var n = prev.rows
            rows.foreach { case (_, pk) => if (pk > wm) wm = pk; n += 1 }
            val next = CursorState(wm, n)
            state.update(next)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            CursorUpdate(key, next.watermark, next.rows)
          }
      }
  }

  /** flatMapGroupsWithState variant: emits a [[CursorUpdate]] only when the
    * watermark actually ADVANCED (0 or 1 outputs per key per batch — the
    * delta stream a downstream checkpoint consumer wants, vs
    * [[trackCursors]]' echo of every touched key). Append-mode compatible. */
  def trackCursorDeltas(input: Dataset[(String, Long)])
                       (implicit enc1: org.apache.spark.sql.Encoder[CursorState],
                        enc2: org.apache.spark.sql.Encoder[CursorUpdate]): Dataset[CursorUpdate] =
    input.groupByKey(_._1)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState[CursorState, CursorUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[CursorState]) =>
          val prev = state.getOption.getOrElse(CursorState(Long.MinValue, 0L))
          var wm = prev.watermark; var n = prev.rows
          rows.foreach { case (_, pk) => if (pk > wm) wm = pk; n += 1 }
          val next = CursorState(wm, n)
          state.update(next)
          if (wm > prev.watermark) Iterator.single(CursorUpdate(key, wm, n))
          else Iterator.empty
      }

  /** Stream-stream interval join (the unbounded form of
    * [[graft.operators.Temporal.rangeJoinBinned]]'s fixture query): left
    * rows pair with right rows of the same key whose event time falls in
    * [left.ts, left.ts + window). Both sides carry watermarks, and the
    * time-bound join condition is what lets Spark EVICT buffered state —
    * an unbounded stream-stream join without a time bound grows state
    * forever. Batch twin: `join_range_purchase_clicks` (oracle-checked);
    * in batch mode the same plan is an ordinary range join. */
  def intervalJoinStream(left: DataFrame, right: DataFrame, keyCol: String,
                         tsCol: String, window: String,
                         lateness: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(tsCol, lateness).alias("l")
    val r = right.withWatermark(tsCol, lateness).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$tsCol") >= col(s"l.$tsCol") &&
        col(s"r.$tsCol") < col(s"l.$tsCol") + expr(s"INTERVAL $window"))
  }

  /** readStream → transform → writeStream harness over a Parquet directory
    * source — the file-native analogue of taps' chunked pull. Exactly-once:
    * the file sink commits atomically per batch, checkpoint carries offsets
    * (T2/T3 in one config). */
  def fileToFile(spark: SparkSession, srcDir: String, schemaFrom: DataFrame,
                 transform: DataFrame => DataFrame,
                 dstDir: String, checkpoint: String): StreamingQuery =
    transform(
      spark.readStream.schema(schemaFrom.schema).parquet(srcDir))
      .writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow()) // drain-and-stop: taps' graceful T6
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", dstDir)
      .start()
}
