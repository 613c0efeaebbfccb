package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Edge-case insurance for the driver-resident graph tiers (the
  * broadcast-gated fast paths added in round 18): empty inputs, single
  * nodes/edges, and self-loop-only graphs must return well-formed empty
  * or trivial frames with the documented schemas — not throw — on the
  * DEFAULT (gated) path, which on these tiny inputs is the driver tier.
  * Result-correctness against brute force and the distributed twins is
  * pinned in GraphSpec; this spec pins the degenerate shapes. */
class GraphDriverTierSpec extends AnyFunSuite with SparkSpec {

  private def emptyPairs = {
    val sq = spark
    import sq.implicits._
    Seq.empty[(Long, Long)].toDF("u", "v")
  }

  private def emptyWeighted = {
    val sq = spark
    import sq.implicits._
    Seq.empty[(Long, Long, Long)].toDF("u", "v", "w")
  }

  test("empty inputs return empty frames with the documented columns") {
    assert(Graph.kcorePeel(emptyPairs, "u", "v", k = 2, rounds = 2)
      .columns.toSeq == Seq("node", "degree"))
    assert(Graph.kcorePeel(emptyPairs, "u", "v", k = 2, rounds = 2)
      .collect().isEmpty)
    assert(Graph.ssspBounded(emptyWeighted, "u", "v", "w", rounds = 2)
      .collect().isEmpty)
    assert(Graph.pathCounts(emptyPairs, "u", "v", nSources = 2,
      maxDepth = 2).collect().isEmpty)
    assert(Graph.betweennessSampled(emptyPairs, "u", "v", nSources = 2,
      maxDepth = 2).collect().isEmpty)
    assert(Graph.connectedComponentsMinLabel(emptyPairs, "u", "v")
      .collect().isEmpty)
    assert(Graph.multiSourceBfs(emptyPairs, "u", "v", nSources = 2,
      maxDepth = 2).collect().isEmpty)
    assert(Graph.labelPropagate(emptyPairs, "u", "v", rounds = 2)
      .collect().isEmpty)
    assert(Graph.bfsLevelsUndirected(emptyPairs, "u", "v", maxDepth = 3)
      .collect().isEmpty)
    assert(Graph.pagerankUndirected(emptyPairs, "u", "v", iters = 2)
      .collect().isEmpty)
    assert(Graph.personalizedPagerank(emptyPairs, "u", "v", iters = 2,
      nSeeds = 2).collect().isEmpty)
    assert(Graph.louvainLevels(emptyWeighted, "u", "v", "w", maxLevels = 3)
      .collect().isEmpty)
    assert(Graph.trussPeel(emptyPairs, "u", "v", k = 4, rounds = 1)
      .collect().isEmpty)
    assert(Graph.sccPivot(emptyPairs, "u", "v", maxDepth = 3)
      .collect().isEmpty)
  }

  test("single-edge and self-loop-only graphs take the trivial answers") {
    val sq = spark
    import sq.implicits._
    val one = Seq((1L, 2L)).toDF("u", "v")
    // one edge: both nodes degree 1, peeled at k=2 after round 1
    assert(Graph.kcorePeel(one, "u", "v", k = 2, rounds = 1)
      .collect().isEmpty)
    // min-label CC: both nodes label 1
    assert(Graph.connectedComponentsMinLabel(one, "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L))
    // BFS from node 1 reaches node 2 at level 1
    assert(Graph.bfsLevelsUndirected(one, "u", "v", maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap ==
      Map(1L -> 0, 2L -> 1))
    // Louvain on a self-loop-only graph: zero moves, identity partition
    val selfLoop = Seq((7L, 7L, 5L)).toDF("u", "v", "w")
    assert(Graph.louvainLevels(selfLoop, "u", "v", "w", maxLevels = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(7L -> 7L))
    // SCC pivot on a 2-cycle: both nodes in the component
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("s", "t")
    assert(Graph.sccPivot(cyc, "s", "t", maxDepth = 3)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }
}
