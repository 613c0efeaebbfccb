package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling and split operators for training-data curation
 * (SURVEY §2.11 [EXT] adjunct): train/test assignment, exact stratified
 * sampling, per-group caps.
 *
 * Everything keys off a cryptographic hash of the row id — NO RNG, so
 * assignments are reproducible run-over-run, stable under repartitioning,
 * and replayable by the DuckDB oracle (md5 is the one cross-engine hash).
 * Cluster shape: hash-split is a pure map (zero shuffle); stratified
 * sampling and caps are one window shuffle on the stratum key — both
 * trivially parallel at 100 TB. Skewed strata (one giant group) inherit the
 * single-partition-per-stratum window cost; cap/sample per SUB-stratum and
 * re-aggregate when a stratum exceeds one executor's slice.
 */
object Sampling {

  /** 16-bit bucket from the leading md5 hex digits of the id — the
    * deterministic "random" driver for every operator here. Uniform to
    * ~0.4% (65536 % 100 bias), which is what hash-bucket splits accept in
    * exchange for engine-independence. */
  private def hashBucket(idCol: Column, buckets: Int): Column =
    conv(substring(md5(idCol.cast("string")), 1, 4), 16, 10)
      .cast("long") % lit(buckets.toLong)

  /** Train/test split: `trainPct` percent of rows (by id-hash bucket) get
    * 'train', the rest 'test'. Pure map — no shuffle, no state; a row's
    * split never changes as the corpus grows, which is the property
    * training pipelines need (new data cannot flip old rows across the
    * leakage boundary). */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100, s"trainPct in [0,100], got $trainPct")
    df.withColumn("split",
      when(hashBucket(col(idCol), 100) < trainPct, "train").otherwise("test"))
  }

  /** Deterministic source mixing: keep each row with a per-stratum
    * percentage — the domain-reweighting step of a training-data pipeline
    * ("90% of wiki, 10% of crawl"). Pure map like [[hashSplit]]: no
    * shuffle, membership a function of (id, rate) alone, so it is stable
    * under corpus growth and reproducible across engines. `ratePct` is an
    * integer Column in [0,100], typically derived from the stratum column
    * (a literal lookup or join against a mixing-weights table). */
  def weightedMix(df: DataFrame, idCol: String, ratePct: Column): DataFrame =
    df.filter(hashBucket(col(idCol), 100) < ratePct)

  /** Exact stratified sample: per stratum, keep ceil(frac·n) rows chosen in
    * id-hash order (deterministic pseudo-random, ties broken by id). Exact
    * counts per group — unlike `df.sampleBy`, which is Bernoulli and only
    * approximates the fraction — at the cost of one window shuffle. */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
                 frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac in [0,1], got $frac")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashBucket(col(idCol), 1 << 16).asc, col(idCol).asc)
    val n = Window.partitionBy(col(strataCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .filter(col("__rn") <= ceil(lit(frac) * col("__n")))
      .drop("__rn", "__n")
  }

  /** Concatenate-and-chop sequence packing, per group: order each group's
    * chunks by `orderCols`, accumulate token counts, and assign every chunk
    * to context window floor(start_offset / capacity) — the standard LLM
    * pre-training packing step (documents are concatenated into a token
    * stream and sliced at the context boundary; a chunk straddling the
    * boundary belongs to the window its first token lands in). Partitioned
    * by `groupCol`, so the window pass parallelizes across groups instead
    * of collapsing to a single global sort (domains/shards are the natural
    * packing unit at corpus scale). Emits (group, window_id, start_offset)
    * per input row. */
  def packSequences(chunks: DataFrame, groupCol: String, orderCols: Seq[String],
                    tokenCol: String, capacity: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("__end", sum(col(tokenCol)).over(w))
      .withColumn("start_offset", (col("__end") - col(tokenCol)).cast("long"))
      .withColumn("window_id",
        floor(col("start_offset").cast("double") / lit(capacity.toDouble)).cast("long"))
      .drop("__end")
  }

  /** Per-group cap: keep at most `n` rows per group, lowest `orderCol`
    * first (corpus curation: "at most N documents per domain"). One window
    * shuffle; Spark inserts WindowGroupLimit so per-partition top-n prunes
    * before the exchange. */
  def capPerGroup(df: DataFrame, groupCol: String, orderCol: String,
                  n: Int): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
