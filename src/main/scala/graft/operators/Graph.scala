package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph computation on plain DataFrames — the PageRank loop every
 * engine demo runs, built the way a 1000-executor job needs it: each
 * iteration is ONE hash join (edges ⋈ scores on the source) plus ONE
 * aggregation (contributions by target), both shuffling on the node id, so
 * an iteration's cost is two node-keyed exchanges and the edge table is
 * never replicated. Spark's lazy lineage chains the iterations into one
 * DAG; for dozens of iterations, localCheckpoint every ~10 to cut lineage
 * (documented, not needed at the fixed small iteration counts a batch
 * pipeline uses).
 *
 * All arithmetic is INTEGER fixed-point (scores in millionths; damping
 * 0.85 applied as (17·x) div 20; per-edge contribution pr div outdeg):
 * floor division is exact and associative-safe, so the result is
 * bit-identical cross-run, cross-partitioning, AND cross-engine — a
 * DuckDB oracle replays the same three chained CTE iterations integer for
 * integer. (Float PageRank sums doubles in partition order:
 * nondeterministic everywhere.)
 */
object Graph {

  /** `iters` rounds of damped PageRank over a DIRECTED edge list
    * (`srcCol`, `dstCol`); undirected graphs pass both orientations.
    * Scores start at 1_000_000 per node; each round:
    * pr'(v) = 150_000 + (17 · Σ_{u→v} (pr(u) div outdeg(u))) div 20.
    * Nodes with no in-edges keep the 150_000 base (left join). Returns
    * (node, pagerank). Truncation loses < 1 millionth per edge per round —
    * irrelevant for ranking, and the price of exactness. */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // materialize the iteration INPUTS once: every round references the
    // edge list, and lazy lineage would re-run whatever produced it (an
    // expensive self-join, a dedup…) once per round — measured 7.1 s at
    // sf0.1 un-checkpointed vs edges-computed-once after. localCheckpoint
    // blocks don't survive executor loss; a long-running production loop
    // swaps in reliable checkpointing, same shape (the CC precedent).
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__t"))
      .localCheckpoint()
    val outd = e.groupBy(col("__s")).agg(count(lit(1)).as("__od"))
      .localCheckpoint()
    val nodes = e.select(col("__s").as("__n"))
      .union(e.select(col("__t").as("__n"))).distinct()
      .localCheckpoint()
    var pr = nodes.withColumn("__pr", lit(1000000L))
    (1 to iters).foreach { _ =>
      val contrib = e
        .join(pr.withColumnRenamed("__n", "__s"), Seq("__s"))
        .join(outd, Seq("__s"))
        .groupBy(col("__t"))
        .agg(sum(expr("__pr div __od")).as("__c"))
      pr = nodes.join(contrib.withColumnRenamed("__t", "__n"), Seq("__n"), "left")
        .select(col("__n"),
          (lit(150000L) + expr("(17 * coalesce(__c, 0L)) div 20")).as("__pr"))
    }
    // the returned frame is itself checkpointed so the input blocks can
    // be freed NOW (they're invisible to catalog.clearCache and would
    // otherwise starve the next memory-hungry job — the r5 leak lesson)
    val result = pr.select(col("__n").as("node"), col("__pr").as("pagerank"))
      .localCheckpoint()
    Dedup.freeCheckpoints(e, outd, nodes)
    result
  }
}
