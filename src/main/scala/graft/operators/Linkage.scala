package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Blocked fuzzy record linkage: find pairs of rows that likely describe
 * the same real-world entity, without an exact key — the entity-resolution
 * step of a data-integration pipeline (and the string-side sibling of the
 * minhash document family in [[Dedup]]: short attribute strings score with
 * edit-family measures, long documents with set similarity).
 *
 * Scale shape: the candidate space is pruned by BLOCKING — pairs must
 * agree exactly on `blockCols`, so candidates materialize through a plain
 * equi-join (hash-partitioned on the block key, never a cross product) and
 * the per-block work is |block|², bounded by the blocking key's
 * cardinality design, not the table size. Scoring is the codegen'd native
 * [[org.apache.spark.sql.graft.JaroWinkler]] expression (bit-equal to
 * DuckDB's `jaro_winkler_similarity`, which is what makes the score gate
 * oracle-expressible) plus the unit-cost edit distance as a secondary
 * signal. Canonical `id_a < id_b` halves the self-join and removes
 * self-pairs.
 */
object Linkage {

  /** Candidate pairs from `df` agreeing on every `blockCols` value, with
    * Jaro-Winkler ≥ `minScore` on `nameCol`; returns (blockCols…, id_a,
    * id_b, name_a, name_b, jw, lev). A skewed block (one giant blocking
    * value) is the operator's documented hazard — pick blocking keys with
    * bounded group sizes, or salt the block with a second attribute. */
  def linkPairs(df: DataFrame, idCol: String, nameCol: String,
                blockCols: Seq[String], minScore: Double): DataFrame = {
    require(blockCols.nonEmpty, "blocking columns required: an unblocked " +
      "self-join is the cross product this operator exists to avoid")
    require(minScore >= 0 && minScore <= 1, s"minScore in [0,1], got $minScore")
    import org.apache.spark.sql.graft.{JaroWinkler => JW}
    // pin the probe side's parallelism on the block key: the scoring
    // stage is byte-light but compute-dense (|block|² JW evaluations),
    // exactly what AQE's byte-based coalescing serializes — measured as
    // ONE 3.1 s task on the single-row-group fixture before the pin
    val par = df.sparkSession.sparkContext.defaultParallelism
    val a = df.select((blockCols.map(col) :+
      col(idCol).as("id_a")) :+ col(nameCol).as("name_a"): _*)
      .repartition(par, blockCols.map(col): _*)
    val b = df.select((blockCols.map(col) :+
      col(idCol).as("id_b")) :+ col(nameCol).as("name_b"): _*)
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("jw", JW.of(col("name_a"), col("name_b")))
      .filter(col("jw") >= minScore)
      .withColumn("lev",
        levenshtein(col("name_a"), col("name_b")).cast("int"))
  }

  /** Per-row NEAREST NEIGHBOR by edit distance within its block: for every
    * row, the block-mate whose `nameCol` has the minimum Levenshtein
    * distance (ties by the smaller candidate id — integer-exact, so the
    * winner is deterministic cross-run and cross-engine). The fuzzy-match
    * complement of [[linkPairs]]: linkPairs gates by an absolute score
    * (how MANY pairs clear a bar), this answers "what is each record's
    * best candidate" — the shape a merge-suggestion / spell-correction
    * pipeline consumes. Rows whose block contains no other row are absent
    * (no candidate exists).
    *
    * Scale shape: same blocked equi-join as [[linkPairs]] (|block|²
    * scoring bounded by the blocking design, never a cross product), with
    * BOTH directions kept (each row needs its own argmin, so the id_a <
    * id_b halving does not apply), then ONE aggregation — the argmin is a
    * `min(struct(dist, id))` fold, partial map-side, never a per-block
    * sort. Parallelism pinned on the block key against AQE's byte-based
    * coalescing (the scoring stage is byte-light, compute-dense). */
  def nearestByEdit(df: DataFrame, idCol: String, nameCol: String,
                    blockCols: Seq[String]): DataFrame = {
    require(blockCols.nonEmpty, "blocking columns required: an unblocked " +
      "self-join is the cross product this operator exists to avoid")
    val par = df.sparkSession.sparkContext.defaultParallelism
    val a = df.select((blockCols.map(col) :+
      col(idCol).as("id")) :+ col(nameCol).as("name_a"): _*)
      .repartition(par, blockCols.map(col): _*)
    val b = df.select((blockCols.map(col) :+
      col(idCol).as("cand")) :+ col(nameCol).as("name_b"): _*)
    a.join(b, blockCols)
      .filter(col("id") =!= col("cand"))
      .select(col("id"),
        struct(levenshtein(col("name_a"), col("name_b")).cast("int")
          .as("dist"), col("cand").as("match_id")).as("__m"))
      .groupBy(col("id"))
      .agg(min(col("__m")).as("__m"))
      .select(col("id"), col("__m.match_id").as("match_id"),
        col("__m.dist").as("dist"))
  }
}
