package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** The r19 FromBaskets driver tiers (shared [[Graph.collectBaskets]]
  * substrate) pinned against their distributed twins: the tier consumes
  * the RAW (group, item) stream — duplicates and all — and must return
  * row-for-row (and for the rounded doubles BIT-for-bit) what the
  * distributed basket-fold + edge-derivation pipeline returns. Also pins
  * the gate fallbacks (row cap, pair-expansion cap, forced-flag throws)
  * and the driver replica of Spark's round(x, 6). */
class GraphBasketTierSpec extends AnyFunSuite with SparkSpec {

  /** Random basket stream WITH duplicate (group, item) rows — the raw
    * form the tiers must dedup exactly like the distributed distinct. */
  private def randomBaskets(seed: Int, nGroups: Int, nItems: Int,
                            rows: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (1 to rows).map { _ =>
      (rnd.nextInt(nGroups).toLong + 10L, rnd.nextInt(nItems).toLong + 500L)
    }
  }

  private def basketDf(rows: Seq[(Long, Long)]): DataFrame = {
    val sq = spark
    import sq.implicits._
    rows.toDF("g", "i")
  }

  /** The SparkEntry edge derivation (itemPairs + distinct), the distEdges
    * twin input of the FromBaskets entry points. */
  private def distEdges(items: DataFrame): DataFrame =
    Graph.itemPairs(items, "g", "i").select(col("u"), col("v")).distinct()

  private def rowSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("FromBaskets tiers equal their distributed twins bit-for-bit " +
      "(duplicate rows, random baskets)") {
    val rows = randomBaskets(41, nGroups = 25, nItems = 18, rows = 400) ++
      randomBaskets(41, 25, 18, 50) // extra duplicates
    val df = basketDf(rows)
    def both(f: Option[Boolean] => DataFrame): (Set[Seq[Any]], Set[Seq[Any]]) =
      (rowSet(f(None)), rowSet(f(Some(false))))
    Seq[(String, Option[Boolean] => DataFrame)](
      "triangles" -> (fl => Graph.triangleCountFromBaskets(df, "g", "i",
        distEdges(df), fl)),
      "clustering" -> (fl => Graph.clusteringFromBaskets(df, "g", "i",
        distEdges(df), fl)),
      "transitivity" -> (fl => Graph.transitivityFromBaskets(df, "g", "i",
        distEdges(df), fl)),
      "edgeJaccard" -> (fl => Graph.edgeJaccardTopKFromBaskets(df, "g", "i",
        k = 15, distEdges(df), fl)),
      "trussPeel" -> (fl => Graph.trussPeelFromBaskets(df, "g", "i",
        k = 4, rounds = 1, distEdges(df), fl)),
      "bipartite" -> (fl => Graph.bipartiteProjectionTopK(df, "g", "i",
        topK = 15, fl))
    ).foreach { case (name, f) =>
      val (tier, twin) = both(f)
      assert(tier == twin, s"$name driver tier != distributed twin")
      assert(tier.nonEmpty, s"$name degenerate test input")
    }
  }

  test("FromBaskets tiers: empty and trivial inputs") {
    val sq = spark
    import sq.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("g", "i")
    assert(Graph.triangleCountFromBaskets(empty, "g", "i", distEdges(empty))
      .collect().map(_.getLong(0)).toSeq == Seq(0L))
    assert(Graph.clusteringFromBaskets(empty, "g", "i", distEdges(empty))
      .collect().isEmpty)
    val tr = Graph.transitivityFromBaskets(empty, "g", "i", distEdges(empty))
      .collect()(0)
    assert(tr.getLong(0) == 0L && tr.getLong(1) == 0L && tr.isNullAt(2))
    assert(Graph.edgeJaccardTopKFromBaskets(empty, "g", "i", 5,
      distEdges(empty)).collect().isEmpty)
    assert(Graph.bipartiteProjectionTopK(empty, "g", "i", 5)
      .collect().isEmpty)
    // single-item groups: no pairs anywhere
    val singles = Seq((1L, 7L), (2L, 8L), (3L, 9L)).toDF("g", "i")
    assert(Graph.bipartiteProjectionTopK(singles, "g", "i", 5)
      .collect().isEmpty)
    assert(Graph.triangleCountFromBaskets(singles, "g", "i",
      distEdges(singles)).collect().map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("pair-expansion cap falls back to the distributed twin; forced " +
      "flag throws past either gate") {
    val rows = randomBaskets(43, 4, 30, 300) // few hub groups → big expansion
    val df = basketDf(rows)
    val conf = spark.conf
    val was = conf.getOption("graft.graph.pairStreamLimit")
    try {
      conf.set("graft.graph.pairStreamLimit", "10")
      val viaTwin = Graph.bipartiteProjectionTopK(df, "g", "i", 10, None)
      val twin = Graph.bipartiteProjectionTopK(df, "g", "i", 10, Some(false))
      assert(rowSet(viaTwin) == rowSet(twin))
      intercept[IllegalArgumentException] {
        Graph.bipartiteProjectionTopK(df, "g", "i", 10, Some(true))
      }
    } finally {
      was.fold(conf.unset("graft.graph.pairStreamLimit"))(
        conf.set("graft.graph.pairStreamLimit", _))
    }
    val wasB = conf.getOption("graft.graph.broadcastLimitBytes")
    try {
      conf.set("graft.graph.broadcastLimitBytes", "64") // capRows = 4
      val viaTwin = Graph.triangleCountFromBaskets(df, "g", "i",
        distEdges(df), None)
      val twin = Graph.triangleCountFromBaskets(df, "g", "i",
        distEdges(df), Some(false))
      assert(rowSet(viaTwin) == rowSet(twin))
      intercept[IllegalArgumentException] {
        Graph.triangleCountFromBaskets(df, "g", "i", distEdges(df),
          Some(true))
      }
    } finally {
      wasB.fold(conf.unset("graft.graph.broadcastLimitBytes"))(
        conf.set("graft.graph.broadcastLimitBytes", _))
    }
    // non-BIGINT ids: auto-declines, forced throws
    val sq = spark
    import sq.implicits._
    val strDf = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("g", "i")
    assert(rowSet(Graph.bipartiteProjectionTopK(strDf, "g", "i", 5, None)) ==
      rowSet(Graph.bipartiteProjectionTopK(strDf, "g", "i", 5, Some(false))))
    intercept[IllegalArgumentException] {
      Graph.bipartiteProjectionTopK(strDf, "g", "i", 5, Some(true))
    }
  }

  test("sparkRound6 is bit-equal to the SQL round(x, 6)") {
    val sq = spark
    import sq.implicits._
    val rnd = new scala.util.Random(47)
    // random magnitudes around [0, 1] (the cosine/jaccard range) plus
    // adversarial half-way points and representability edges
    val xs = (1 to 2000).map(_ => rnd.nextDouble()) ++
      (1 to 500).map(_ => rnd.nextInt(2000000).toDouble / 2000000.0) ++
      Seq(0.0000005, 0.0000015, 0.1234565, 0.9999995, 1.0, 0.5,
        2.0 / 3.0, 1.0 / 3.0, 0.3333335, 0.0000004999999999,
        Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    val got = xs.map(Graph.sparkRound6)
    val want = xs.toDF("x").select(round(col("x"), 6)).collect()
      .map(_.getDouble(0))
    got.zip(want).zip(xs).foreach { case ((g, w), x) =>
      assert(java.lang.Double.doubleToLongBits(g) ==
        java.lang.Double.doubleToLongBits(w) ||
        (g.isNaN && w.isNaN), s"round mismatch at x=$x: got $g want $w")
    }
  }
}
