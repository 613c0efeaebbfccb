package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Rank-error pins for the t-digest quantile sketch — the mergeable
  * guarantee must hold across arbitrary partitionings (merge trees), which
  * is the whole point of a sketch vs exact `percentile`. */
class TDigestSpec extends AnyFunSuite with SparkSpec {

  private val probs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  /** Rank error of estimate v against target quantile p: a tied value
    * occupies a rank INTERVAL [first, last]/n — the error is the distance
    * from p to the nearest rank in that interval (0 when p falls inside,
    * e.g. any mid quantile of a constant-heavy stream). */
  private def rankErr(sorted: Array[Double], v: Double, p: Double): Double = {
    val n = sorted.length
    var lo = 0; var hi = n
    while (lo < hi) { val m = (lo + hi) >>> 1
      if (sorted(m) < v) lo = m + 1 else hi = m }
    val first = lo
    hi = n
    while (lo < hi) { val m = (lo + hi) >>> 1
      if (sorted(m) <= v) lo = m + 1 else hi = m }
    val (rLo, rHi) = (first.toDouble / n, lo.toDouble / n)
    if (p < rLo) rLo - p else if (p > rHi) p - rHi else 0.0
  }

  private def checkRankError(values: Seq[Double], label: String,
                             bound: Double): Unit = {
    import spark.implicits._
    val sorted = values.toArray.sorted
    for (parts <- Seq(1, 4, 32)) {
      val est = values.toDF("v").repartition(parts)
        .agg(TDigest.quantiles(col("v"), probs).as("q"))
        .head().getSeq[Double](0)
      probs.zip(est).foreach { case (p, v) =>
        val err = rankErr(sorted, v, p)
        assert(err <= bound,
          f"$label parts=$parts q=$p: estimate $v has rank error $err%.4f > $bound")
      }
    }
  }

  test("rank error <= 1% on smooth streams, <= 2% at massive-tie edges, " +
      "at compression 100 under 1/4/32 partitionings") {
    val rnd = new scala.util.Random(7)
    checkRankError(Seq.fill(20000)(rnd.nextDouble() * 1000), "uniform", 0.01)
    checkRankError(Seq.fill(20000)(math.exp(rnd.nextGaussian() * 2)),
      "lognormal", 0.01)
    // 60% of the mass on one value: tie-interior quantiles answer exactly
    // (the tie-interior rule); only the tie's EDGE quantiles interpolate
    // across half a centroid, hence the looser 2% there
    checkRankError(Seq.fill(12000)(42.0) ++ Seq.fill(8000)(rnd.nextDouble() * 100),
      "constant-heavy", 0.02)
  }

  test("tails are sharp: extreme quantiles of a known sequence land within " +
      "1% rank of truth, and a constant stream is exact") {
    import spark.implicits._
    val est = (1 to 10000).map(_.toDouble).toDF("v").repartition(8)
      .agg(TDigest.quantiles(col("v"), Seq(0.001, 0.999)).as("q"))
      .head().getSeq[Double](0)
    assert(math.abs(est(0) - 10.0) <= 100.0, s"p001 ${est(0)}")
    assert(math.abs(est(1) - 9990.0) <= 100.0, s"p999 ${est(1)}")
    val const = Seq.fill(500)(3.25).toDF("v")
      .agg(TDigest.quantiles(col("v"), Seq(0.5)).as("q"))
      .head().getSeq[Double](0)
    assert(const.head == 3.25)
  }

  test("winsorizeSketched keeps the exact operator's shape: same rows, " +
      "clips within 1% rank of the exact winsorize bounds") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 8000).map(i =>
      (i % 4, if (rnd.nextInt(50) == 0) 1e6 else rnd.nextDouble() * 100))
      .toDF("g", "v")
    val exact = graft.operators.Curation.winsorize(df, "g", "v", 0.05, 0.95)
    val sk = graft.operators.Curation.winsorizeSketched(df, "g", "v", 0.05, 0.95)
    assert(sk.count() == exact.count())
    // the outlier spikes must be capped by both
    assert(sk.agg(max(col("v_w"))).head().getDouble(0) < 1e6)
    // per-group clipped means agree closely (bounds differ only by sketch
    // rank error on a smooth region of the distribution)
    val em = exact.groupBy("g").agg(avg("v_w")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val sm = sk.groupBy("g").agg(avg("v_w")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    em.foreach { case (g, m) =>
      assert(math.abs(sm(g) - m) / m < 0.02, s"group $g: $m vs ${sm(g)}")
    }
  }

  test("centroid count stays bounded by the compression budget (the " +
      "per-group state the 100 TB path exists for)") {
    val agg = new TDigest(100, Seq(0.5))
    val rnd = new scala.util.Random(3)
    var buf = agg.zero
    (1 to 50000).foreach(_ => buf = agg.reduce(buf, rnd.nextDouble() * 1e6))
    val merged = agg.merge(buf, agg.zero)
    assert(merged.centroids.size <= 200,
      s"${merged.centroids.size} centroids exceed ~2x compression")
    assert(merged.buffer.isEmpty)
  }
}
