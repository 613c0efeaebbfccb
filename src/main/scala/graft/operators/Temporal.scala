package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators the reference (and Spark) lack as built-ins but
 * every time-series / feature-engineering pipeline needs: the as-of join
 * (latest build row at or before each probe time) and the interval range
 * join (points falling inside keyed time windows).
 *
 * Both are built so the plan NEVER degenerates into a
 * BroadcastNestedLoopJoin or a cartesian product — the failure mode of
 * writing these as raw inequality joins. At 100 TB an inequality-only join
 * is O(n·m) per key; these formulations are one hash shuffle each:
 *
 *  - [[asofJoin]] — union both sides, one window pass per key
 *    (sort-merge within partitions), emit the carried build values at probe
 *    rows. Shuffle volume = |probe| + |build|, the theoretical minimum.
 *  - [[rangeJoinBinned]] — quantize intervals to covering bins, equi-join
 *    points on (key, bin), post-filter the bounds. Shuffle volume =
 *    |points| + |intervals|·bins-per-interval; bin width tunes the
 *    replication-vs-selectivity trade exactly like Flink/Trino interval
 *    joins and the published DBMS range-join literature.
 */
object Temporal {

  /** As-of join: for every probe row, attach `valueCols` from the NEAREST
    * build row with the same `keys` on the probe's side of time —
    * `direction = "backward"` (default) takes the latest build row with
    * time ≤ probe time (< when `strict`), `"forward"` the earliest with
    * time ≥ probe time (>) — the two directions pandas `merge_asof` / kdb
    * `aj` expose. Probe rows with no qualifying build row keep NULLs (left
    * semantics). `toleranceUs ≥ 0` additionally NULLs a match farther than
    * that many microseconds from the probe time (pandas tolerance
    * semantics: the nearest row either qualifies or the probe matches
    * nothing — never the next-nearest).
    *
    * Single-shuffle formulation: tag and union both sides; build rows wrap
    * ALL their `valueCols` (plus their own event time, for the tolerance
    * test) in one non-null struct, and one window over (keys) ordered by
    * (time, side) computes `last(struct, ignoreNulls)` up to the current
    * row — at a probe row that IS the as-of build ROW. Direction only flips
    * the time sort (forward traverses latest→earliest, so "last seen" is
    * the earliest-at-or-after); the side tiebreak is direction-independent.
    * The struct wrapper matters twice: a build value that is itself NULL
    * still wins (the match is the row, not the value — exactly DuckDB ASOF
    * semantics), and multiple valueCols always come from the SAME build row
    * rather than each carrying its own latest-non-null. Non-strict orders
    * build before probe at equal times (visible); strict orders it after
    * (invisible).
    *
    * `build` must be unique per (keys, time) — aggregate it first (the ties
    * would otherwise resolve by partition order, which is not
    * deterministic). Probe columns pass through unchanged; `valueCols` must
    * not collide with them. */
  def asofJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
               timeCol: String, valueCols: Seq[String],
               strict: Boolean = false,
               direction: String = "backward",
               toleranceUs: Long = -1L): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val probeCols = probe.columns.toSeq
    require(valueCols.intersect(probeCols).isEmpty,
      s"valueCols ${valueCols.intersect(probeCols)} collide with probe columns")
    val buildSide = if (strict) 1 else 0 // equal-time build rows visible iff non-strict
    val probeSide = 1 - buildSide
    val bvType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(
        c, build.schema(c).dataType, nullable = true)) :+
      org.apache.spark.sql.types.StructField(
        "__bt", build.schema(timeCol).dataType, nullable = true))
    val p = probe.select(probeCols.map(col) ++
      Seq(lit(probeSide).as("__side"), lit(null).cast(bvType).as("__bv")): _*)
    val b = build.select(
      probeCols.map(c =>
        if (keys.contains(c) || c == timeCol) col(c)
        else lit(null).cast(probe.schema(c).dataType).as(c)) ++
      Seq(lit(buildSide).as("__side"),
        struct(valueCols.map(col) :+ col(timeCol).as("__bt"): _*).as("__bv")): _*)
    val timeOrder =
      if (direction == "backward") col(timeCol).asc else col(timeCol).desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = p.unionByName(b)
      .select(probeCols.map(col) ++ Seq(col("__side"),
        last(col("__bv"), ignoreNulls = true).over(w).as("__bv")): _*)
    // tolerance distance in the time column's own unit: µs for timestamps,
    // raw difference for numeric time columns
    def toUs(c: Column): Column = probe.schema(timeCol).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => unix_micros(c.cast("timestamp"))
      case _ => c.cast("long")
    }
    val within =
      if (toleranceUs < 0) lit(true)
      else if (direction == "backward")
        toUs(col(timeCol)) - toUs(col("__bv.__bt")) <= toleranceUs
      else
        toUs(col("__bv.__bt")) - toUs(col(timeCol)) <= toleranceUs
    carried.filter(col("__side") === probeSide)
      .select(probeCols.map(col) ++
        valueCols.map(c =>
          (if (toleranceUs < 0) col(s"__bv.$c")
           else when(within, col(s"__bv.$c"))).as(c)): _*)
  }

  /** Batch sessionization (gaps-and-islands): assign every event a
    * per-key session number, where a NEW session starts when the gap to the
    * previous event is >= `gapUs` microseconds — the same boundary rule as
    * the streaming `session_window` twin (Spark merges only
    * strictly-overlapping [ts, ts+gap) windows), so batch backfills and the
    * live stream agree on session identity.
    *
    * One shuffle on the key; both window passes (the lag and the running
    * break-sum) share the same (key, time, tie) sort order so Catalyst
    * plans a single Exchange + Sort. `tieCols` break equal-timestamp order
    * deterministically — events at the SAME timestamp always share a
    * session (gap 0 < gapUs) so ties never change session membership, only
    * the stable row order. Returns the input plus `sess_no` (0-based per
    * key); aggregate over (key, sess_no) for per-session stats. */
  def sessionize(events: DataFrame, keyCol: String, timeCol: String,
                 tieCols: Seq[String], gapUs: Long): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val order = (col(timeCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val t = unix_micros(col(timeCol))
    val prev = lag(t, 1).over(w)
    val brk = when(prev.isNull || t - prev >= gapUs, 1).otherwise(0)
    events
      .withColumn("__brk", brk)
      .withColumn("sess_no",
        (sum(col("__brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
          .cast("int"))
      .drop("__brk")
  }

  /** Interval union (merge overlapping intervals): assign every [loCol,
    * hiCol) interval a per-key `island_no` such that intervals in the same
    * island overlap-or-touch transitively — the classic gaps-and-islands
    * union underlying availability windows, downtime stitching, and span
    * coverage. Half-open semantics: [a,b) and [b,c) TOUCH and merge (the
    * union is contiguous); a strict gap (lo > max prior hi) starts a new
    * island. Aggregate over (keys, island_no) with min(lo)/max(hi) for the
    * merged spans.
    *
    * One shuffle on the keys; the prefix-max window and the running
    * break-sum share one (keys, lo, hi, tie) sort so Catalyst plans a
    * single Exchange + Sort — identical scale shape to [[sessionize]]
    * (per-key state in the window pass is ONE running max, not the island's
    * member set). Island numbering is deterministic regardless of tie
    * order: the prefix max over equal (lo, hi) prefixes is
    * order-insensitive. */
  def mergeIntervals(df: DataFrame, keys: Seq[String], loCol: String,
                     hiCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val order = (Seq(col(loCol), col(hiCol)) ++ tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val pmax = max(col(hiCol)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val brk = when(pmax.isNull || col(loCol) > pmax, 1).otherwise(0)
    df.withColumn("__brk", brk)
      .withColumn("island_no",
        (sum(col("__brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
          .cast("int"))
      .drop("__brk")
  }

  /** Cohort retention: the standard product-analytics matrix — users
    * grouped by their FIRST-seen day (the cohort), then for every (cohort
    * day, day offset) the number of distinct users active that many days
    * after joining. Offset 0 is the cohort size; retention(c, d) /
    * retention(c, 0) is the curve a dashboard plots.
    *
    * Scale shape: ONE pass over the event stream and ONE exchange on the
    * user id — per-user state is (min day, distinct active-day set),
    * bounded by the calendar span, never by the user's event count
    * (collect_set dedupes map-side; a billion-event bot user still carries
    * ≤ span days of state). The exploded (cohort, offset) stream then
    * collapses by a counting aggregate whose key space is span² — tiny —
    * so the second exchange is matrix-sized. The two-scan alternative
    * (min-date aggregate joined back against a distinct-activity scan)
    * reads the corpus twice and shuffles it twice; this shape does both
    * once. */
  def retentionCohorts(events: DataFrame, keyCol: String, timeCol: String): DataFrame = {
    val day = to_date(col(timeCol))
    events
      .select(col(keyCol).as("__k"), day.as("__d"))
      .groupBy(col("__k"))
      .agg(min(col("__d")).as("cohort_day"),
        collect_set(col("__d")).as("__days"))
      .select(col("cohort_day"),
        explode(col("__days")).as("__day"))
      .select(col("cohort_day"),
        datediff(col("__day"), col("cohort_day")).as("day_offset"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Exponentially-weighted moving average per key: the final smoothed
    * value of each key's series under s₀ = x₀, sᵢ = (1−α)·sᵢ₋₁ + α·xᵢ in
    * event order — the standard telemetry/feature smoother. Returns one
    * row per key: (key, n_events, ewma).
    *
    * The fold is ORDERED (EWMA is inherently sequential), so the rows are
    * gathered per key (collect_list), sorted in-row by (time, ties), and
    * folded left with `aggregate` — every IEEE operation then happens in
    * ONE deterministic sequence, which is what makes the result
    * reproducible cross-run AND cross-engine (a windowed closed-form
    * Σα(1−α)ⁱxᵢ re-sums doubles in partition order). Per-key state is the
    * key's full series — bounded by per-key event count, NOT corpus size;
    * for unbounded per-key histories, chunk by calendar window and chain
    * the chunk EWMAs (sᵢ carries across chunks), keeping each fold bounded.
    * α must be exactly representable (powers of two: 0.5, 0.25, …) for the
    * oracle to replay the identical literal. */
  def ewma(df: DataFrame, keyCol: String, timeCol: String,
           tieCols: Seq[String], valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    // the doc's cross-engine bit-equality contract requires α (and 1−α)
    // to survive the Double→literal→Double round trip EXACTLY, so pin α
    // to the 2^-20 grid (covers every power-of-two smoother and any
    // practical tuning step) instead of letting a non-dyadic α break the
    // contract silently
    require(alpha == math.round(alpha * (1 << 20)).toDouble / (1 << 20),
      s"alpha must be exactly representable on the 2^-20 grid for the " +
        s"cross-engine bit-equality contract (0.5 and 0.25 are; 0.1 is " +
        s"not — use 0.09999942779541016 = 104857/2^20 for a ~0.1 smoother), " +
        s"got $alpha")
    val sortKey = struct(
      (col(timeCol).as("__t") +:
        tieCols.zipWithIndex.map { case (c, i) => col(c).as(s"__k$i") }) :+
        col(valueCol).as("__v"): _*)
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(sortKey)).as("__s"))
      .withColumn("ewma",
        expr(s"aggregate(slice(__s, 2, greatest(size(__s) - 1, 0)), " +
          s"__s[0].__v, (acc, x) -> acc * ${1 - alpha} + x.__v * $alpha)"))
      .drop("__s")
  }

  /** Interval range join: rows of `points` paired with every row of
    * `intervals` sharing `keys` whose [loCol, hiCol) window contains
    * pointCol (inclusive lo, exclusive hi). All columns are non-negative
    * longs in the same unit (e.g. epoch microseconds).
    *
    * The equi-join key is (keys, bin = value div binWidth): each interval
    * explodes to the bins it covers, each point maps to exactly one bin, so
    * a qualifying pair meets in exactly one bucket — no distinct needed —
    * and Catalyst plans a plain hash shuffle join, never a nested loop.
    * Pick binWidth ≈ typical interval length: shorter replicates intervals
    * across more bins, longer packs more non-matches into a bucket for the
    * post-filter to discard. */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // hi is exclusive: an interval ending exactly on a bin boundary does
    // not reach into that bin, hence (hi - 1) div width for the last bin
    val iv = intervals
      .withColumn("__bin", explode(sequence(
        expr(s"$loCol div $binWidth"),
        expr(s"greatest($loCol, $hiCol - 1) div $binWidth"))))
    val pts = points.withColumn("__bin", expr(s"$pointCol div $binWidth"))
    pts.join(iv, keys :+ "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }

  /** Time-weighted average (TWAP) of `valCol` per key: each observation
    * holds until the NEXT one (step interpolation), so its weight is the
    * microsecond gap to the successor; the key's last observation carries
    * no weight (nothing follows it). Returns (keys, n_intervals,
    * span_us, twap) — keys with a single observation are absent (no
    * interval). The monitoring/financial reading of "average value over
    * time" that the row-mean silently gets wrong under irregular
    * sampling. Exactness: the 2-dp value becomes INTEGER CENTS
    * (round(v·100) is exact — no double is ever exactly halfway there),
    * so the weighted sum is one BIGINT and every engine's int64→double
    * conversion is the same single rounding. (The first cut summed in
    * DECIMAL(38,2) and cast — Spark converts decimals to double in one
    * correctly-rounded step, DuckDB divides an int128-backed double by
    * the scale: 1-ulp VALUE_MISMATCH on 31/150 users at sf0.01.) One
    * window sort + one aggregate, both key-partitioned. */
  def timeWeightedAvg(df: DataFrame, keys: Seq[String], timeCol: String,
                      valCol: String, tieCol: String): DataFrame =
    df.select(keys.map(col) :+ unix_micros(col(timeCol).cast("timestamp"))
          .as("__t") :+ col(valCol).as("__v") :+ col(tieCol).as("__tb"): _*)
      .withColumn("__dt", lead(col("__t"), 1).over(
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__t"), col("__tb"))) - col("__t"))
      .filter(col("__dt").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__dt")).cast("bigint").as("span_us"),
        ((sum(expr("CAST(round(__v * CAST(100.0 AS DOUBLE)) AS BIGINT) * __dt"))
            .cast("bigint").cast("double") /
          sum(col("__dt")).cast("bigint").cast("double")) /
          lit(100.0)).as("twap"))
}
