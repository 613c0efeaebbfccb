package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Internals

/**
 * Bloom-filter join pruning (SURVEY §2.4 [EXT] scale tooling): cut the
 * fact-side shuffle of a selective join BEFORE it happens.
 *
 * The 100 TB problem: `fact ⋈ dim_subset` where the dim side is filtered
 * down to a sliver still shuffles EVERY fact row that survives static
 * pushdown — the join itself is where non-matching rows die, and they die
 * after being hashed, serialized and exchanged. Spark's adaptive runtime
 * bloom filter (`spark.sql.optimizer.runtime.bloomFilter.enabled`) does
 * this transparently when statistics cooperate; this operator is the
 * explicit, deterministic form for when the pipeline author KNOWS the join
 * is selective (taps-style sync diffing, dimension slices, benchmark
 * decontamination joins).
 *
 * Mechanics: build the filter distributed (partial aggregation over the
 * dim side — only serialized filter bytes travel, never rows), pull the
 * ~numBits/8 bytes to the driver (bounded by the parameter, independent of
 * data size — same driver-budget contract as the IVF centroid collect),
 * and apply `might_contain(xxhash64(key))` as a fact-side predicate. False
 * positives survive the filter and die in the real join; false negatives
 * are impossible — results are EXACTLY the plain join's (the oracle runs
 * the plain join).
 */
object Prune {

  /** Fact rows that might join `dim` on `factKey = dimKey` — bloom
    * semi-filter only, no join. `expectedItems`/`numBits` size the filter
    * (defaults: 1M keys in 8M bits ≈ 1 MB, ~3% FP at capacity). */
  def bloomSemiFilter(fact: DataFrame, factKey: Column,
                      dim: DataFrame, dimKey: Column,
                      expectedItems: Long = 1000L * 1000,
                      numBits: Long = 8L * 1024 * 1024): DataFrame = {
    val bytes = dim
      .select(Internals.bloomAgg(xxhash64(dimKey), expectedItems, numBits).as("bf"))
      .head.getAs[Array[Byte]](0)
    // empty build side → aggregate yields NULL → nothing can match
    if (bytes == null) fact.where(lit(false))
    else fact.where(Internals.bloomMightContain(bytes, xxhash64(factKey)))
  }

  /** The pruned inner equi-join: bloom-filter the fact side, then run the
    * ordinary join for exactness. At scale the exchange under the join
    * carries only might-match rows — for a 1%-selective dim slice that is
    * a ~100× shuffle-byte cut for one broadcast-sized filter. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKeyName: String, dimKeyName: String,
                      expectedItems: Long = 1000L * 1000,
                      numBits: Long = 8L * 1024 * 1024): DataFrame = {
    val pruned = bloomSemiFilter(fact, col(factKeyName), dim, col(dimKeyName),
      expectedItems, numBits)
    pruned.join(dim, pruned(factKeyName) === dim(dimKeyName))
  }
}
