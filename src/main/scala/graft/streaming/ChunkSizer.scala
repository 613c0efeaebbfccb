package graft.streaming

/**
 * AIMD-ish adaptive batch sizer — reimplements the behavior of the
 * reference's chunk-size feedback controller (`lib/taps/chunksize.rb:37-51`,
 * constants pinned by `spec/chunksize_spec.rb:5-40`), targeting ~1 s per
 * batch round-trip:
 *
 *  - observed time > 3.0 s  → size = ceil(size / 3)   (severe back-off)
 *  - observed time > 1.1 s  → size − 100              (mild back-off)
 *  - observed time < 0.8 s  → size × 2                (fast ramp)
 *  - 0.8 s ≤ t ≤ 1.1 s      → size + 100              (slow ramp)
 *  - floor 1; while retrying, size is frozen
 *  - connection failure resets to 10, then 1 (≤ 2 retries —
 *    `lib/taps/chunksize.rb:17-19`, `lib/taps/utils.rb:97-115`)
 *  - the first 20 observations train a running-average FLOOR applied
 *    thereafter: `fetch_chunksize` returns max(avg, chunksize)
 *    (`lib/taps/data_stream.rb:93-99`), so post-training sizes never fall
 *    below the early mean (and the floor is skipped while in error state)
 *
 * In the Spark engine Catalyst/AQE already adapts partition sizes for
 * shuffles; this controller is for the edges AQE can't see — JDBC sink
 * `batchsize` / source `fetchsize` tuning against an external database,
 * which is exactly where taps used it. Pure, immutable, unit-tested.
 */
final case class ChunkSizer(
    chunksize: Int,
    retries: Int = 0,
    trainedCount: Int = 0,
    trainedTotal: Long = 0L) {

  /** The elapsed time attributable to the remote side: wall time minus local
    * db time minus idle time (taps' `diff`). */
  def observe(wallSecs: Double, localSecs: Double = 0.0, idleSecs: Double = 0.0): ChunkSizer = {
    val diff = wallSecs - localSecs - idleSecs
    val next =
      if (retries > 0) chunksize
      else if (diff > 3.0) math.ceil(chunksize / 3.0).toInt
      else if (diff > 1.1) chunksize - 100
      else if (diff < 0.8) chunksize * 2
      else chunksize + 100
    val floored = math.max(1, next)
    copy(chunksize = if (retries > 0) floored else applyTrainingFloor(floored),
      retries = 0,
      trainedCount = math.min(ChunkSizer.TrainingWindow, trainedCount + 1),
      trainedTotal = if (trainedCount < ChunkSizer.TrainingWindow) trainedTotal + floored else trainedTotal)
  }

  /** Broken-pipe / transport-failure reset: 10 rows, then 1; callers abort
    * after 2 retries (`lib/taps/utils.rb:103-111`). */
  def onFailure: ChunkSizer =
    copy(chunksize = if (retries == 0) 10 else 1, retries = retries + 1)

  def exhausted: Boolean = retries > 2

  /** taps FLOORS post-training chunk sizes at the first-20-chunks mean:
    * `avg_chunksize > chunksize ? avg_chunksize : chunksize`
    * (`lib/taps/data_stream.rb:93-99`) — the early average is treated as a
    * proven-safe lower bound, so later back-offs can't sink below it. */
  private def applyTrainingFloor(size: Int): Int =
    if (trainedCount >= ChunkSizer.TrainingWindow && trainedTotal > 0) {
      val avg = (trainedTotal / trainedCount).toInt
      math.max(size, avg)
    } else size
}

object ChunkSizer {
  val Default = 1000 // DEFAULT_CHUNKSIZE, lib/taps/data_stream.rb:11
  val TrainingWindow = 20
  def apply(): ChunkSizer = ChunkSizer(Default)
}
