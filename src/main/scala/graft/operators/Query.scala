package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/**
 * General relational query layer (SURVEY §2.3–§2.7) over the catalog.
 *
 * The reference has no joins/windows of its own — the north star requires
 * general query capability over ingested tables, and everything here is a
 * thin, declarative composition of Spark built-ins so Catalyst owns the
 * physical strategy (hash vs sort-merge, broadcast, partial aggregation,
 * AQE re-planning).
 *
 * Determinism contract for the DuckDB oracle: every declared query avoids
 * cross-partition float-summation nondeterminism by casting measures to
 * DECIMAL before aggregating (exact arithmetic), then back to DOUBLE for a
 * stable final representation both engines agree on bit-for-bit.
 */
object Query {

  /** Exact-then-double aggregation: sum in integer fixed point
    * (associative, exact), surface as double. Oracle side mirrors with
    * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
    *
    * r15 fast path: the old `sum(cast(x as decimal(18,s)))` allocated a
    * BigDecimal per row (Spark's double→decimal cast goes through the
    * string form) — ~4 s CPU for one Q1-shape pass at sf0.1. The
    * replacement rounds in pure FP, `signum·floor(|x|·10^s + 0.5)` =
    * round-half-away-from-zero on the BINARY double — exactly DuckDB's
    * double→DECIMAL semantics, so cross-engine agreement is by
    * construction (the string-based cast agreed only because the
    * fixtures' measures are 2-decimal-exact doubles) — and sums plain
    * BIGINTs inside whole-stage codegen. Final surface: correctly-rounded
    * long→double, then one division by the exactly-representable 10^s —
    * the same two-step sequence DuckDB's decimal→DOUBLE performs.
    * ANSI throws loudly if the scaled sum overflows BIGINT
    * (≥ 9.2e18·10^-s in the measure's unit — document per caller).
    * Per-VALUE bound: |x|·10^s must stay under 2^53 (≈ 9·10^15 at
    * scale 2 — far past any monetary/quantity measure) or the FP
    * product loses integer resolution; the scale guard below keeps 10^s
    * itself exactly representable, and the per-row `when` branch RAISES
    * on any value past the bound instead of rounding silently where the
    * old decimal cast was exact. The guard compares the already-computed
    * |x|·10^s against one literal inside whole-stage codegen — a single
    * double compare per row, unmeasurable next to the sum itself. */
  def dsum(c: Column, scale: Int = 2): Column = {
    require(scale >= 0 && scale <= 15,
      s"scale must be in [0, 15] (10^s exact in double), got $scale")
    val m = math.pow(10, scale)
    val scaled = abs(c) * lit(m)
    val fixed = when(scaled >= lit(9007199254740992.0), // 2^53
        raise_error(concat(
          lit(s"dsum: |x|*10^$scale >= 2^53 loses integer resolution, x="),
          c.cast("string"))))
      .otherwise(signum(c) * floor(scaled + lit(0.5)))
    (sum(fixed.cast("long")).cast("double") / lit(m)).cast("double")
  }

  /** Exact mean: exact fixed-point sum / count, divided in double — IEEE
    * divisions in a fixed order, bit-stable across engines. */
  def davg(c: Column, scale: Int = 2): Column =
    (dsum(c, scale) / count(c)).cast("double")

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** J5 + A4 flagship: 5-way star join (lineitem→orders→customer→nation→
    * region) with revenue per region/nation. The dimension chain
    * (customer⋈nation⋈region) is tiny relative to the facts at any scale —
    * broadcast it so the only shuffle is lineitem⋈orders on orderkey. */
  def starJoin5Way(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o  = t(spark, dir, "orders")
    val c  = t(spark, dir, "customer")
    val n  = t(spark, dir, "nation")
    val r  = t(spark, dir, "region")
    val dims = c
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(c("c_custkey"), n("n_name"), r("r_name"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(dims), o("o_custkey") === dims("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** A4: TPC-H Q1 shape — grouped sum/avg/count over lineitem. Two-phase
    * hash aggregation (partial map-side combine) comes free from Catalyst;
    * the only shuffle moves one row per (returnflag, linestatus) partial. */
  def aggGroupReturnflag(spark: SparkSession, dir: String): DataFrame =
    // decimal partial aggregation is the map-side cost here; fan the scan
    // out when the file's row groups under-split it (no-op at scale).
    // Measured both ways at sf0.1/local[32] (BenchOne warm): with the
    // round-robin exchange 1.62 s, without it 2.24 s — the single-task
    // partial agg over 600k decimal rows costs more than the exchange, so
    // the fan-out stays even for this pure-aggregate consumer.
    ensureParallelism(t(spark, dir, "lineitem"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** W2: rank within group. Ties in the sort value share a rank, so the
    * output is deterministic even with duplicate prices. */
  def rankPerGroup(df: DataFrame, part: String, order: Column, out: String = "rnk"): DataFrame =
    df.withColumn(out, rank().over(Window.partitionBy(col(part)).orderBy(order)))

  /** W3: running total with an explicit tie-free ordering. Frame is
    * rows-between(unboundedPreceding, current); the measure must be exact
    * (integer-valued or decimal) for cross-engine determinism. */
  def runningTotal(df: DataFrame, part: String, orderCols: Seq[String],
                   measure: Column, out: String = "running"): DataFrame = {
    val w = Window.partitionBy(col(part))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, sum(measure).over(w))
  }

  /** W4: lag/lead deltas per key. */
  def lagDelta(df: DataFrame, part: String, orderCols: Seq[String],
               value: String): DataFrame = {
    val w = Window.partitionBy(col(part)).orderBy(orderCols.map(col): _*)
    df.withColumn("prev_value", lag(col(value), 1).over(w))
      .withColumn("delta", col(value) - col("prev_value"))
  }

  /** O2 top-k: global ORDER BY + LIMIT plans as TakeOrderedAndProject —
    * each partition keeps a k-row heap, no global sort materialization. */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Distributed `ntile(n) OVER (ORDER BY …)`: the naive form moves EVERY
    * row through one task (`Window ← Sort ← Exchange SinglePartition` — the
    * plan shape that kills a 100 TB job). This two-phase formulation keeps
    * the data fully parallel:
    *
    *  1. range-repartition + per-partition sort on the order key (one
    *     shuffle — same cost a global sort would pay anyway);
    *  2. local ranks from `monotonically_increasing_id()` (documented
    *     layout: record number in the low 33 bits, assigned in row order
    *     after the sort — zero extra shuffle, zero window exchange);
    *  3. per-partition row counts — ≤ `shuffle.partitions` rows — come back
    *     to the driver (bounded by cluster width, NOT by data, like the
    *     IVF centroid collect), prefix-summed into partition offsets;
    *  4. global rank = offset(pid) + local rank, and the tile is pure
    *     arithmetic on the rank (first `N mod n` buckets get one extra row,
    *     exactly the built-in's contract).
    *
    * Ties on the order key stay in one range partition, but rank order among
    * ties is partition-internal — pass a tie-free key (same caveat as the
    * built-in). Output matches `ntile(n)` bit-for-bit, pinned by spec. */
  def ntileDistributed(df: DataFrame, n: Int, orderCols: Seq[String],
                       out: String = "tile"): DataFrame = {
    require(n > 0, "ntile bucket count must be positive")
    val order = orderCols.map(col)
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val withId = sorted.withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", (col("__mid").bitwiseAND(lit((1L << 33) - 1)) + 1L))
    // tiny: one row per shuffle partition
    val counts = withId.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val base = total / n
    val rem = total % n
    val cut = rem * (base + 1) // ranks ≤ cut fall in the first `rem` (fat) buckets
    // first `rem` buckets hold base+1 rows, the rest hold base (ntile contract);
    // when base == 0 every rank is ≤ cut so the thin branch never divides by 0
    val fat = expr(s"CAST((__grank - 1) DIV ${base + 1} + 1 AS INT)")
    val thin = expr(s"CAST($rem + (__grank - $cut - 1) DIV ${math.max(base, 1L)} + 1 AS INT)")
    withId
      .withColumn("__grank", element_at(typedLit(offsets), col("__pid")) + col("__lrn"))
      .withColumn(out, when(col("__grank") <= lit(cut), fat).otherwise(thin))
      .drop("__mid", "__pid", "__lrn", "__grank")
  }

  /** Give a compute-bound map stage at least the cluster's default
    * parallelism. A small input (one Parquet row group) plans as ONE scan
    * partition, which pins every downstream per-row expression — md5 over
    * exploded n-grams, image decode — to a single task regardless of
    * cluster width. When that happens, one cheap exchange of the narrow
    * input unlocks full-width compute; when the scan already splits (the
    * 100 TB case: thousands of row groups ≫ cores), this is a NO-OP — no
    * exchange is ever added to a well-partitioned plan. */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= want) df else df.repartition(want)
  }
}
