package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One t-digest centroid: a cluster of nearby samples summarized as
  * (mean, weight). */
final case class TdCentroid(mean: Double, weight: Long)

/** t-digest state: bounded centroid list + a small unmerged sample buffer
  * (amortizes the compress pass to once per `BufferSize` rows). */
final case class TdBuf(centroids: Seq[TdCentroid], buffer: Seq[Double])

/**
 * Merging t-digest (Dunning & Ertl) as a typed `Aggregator` — the
 * mergeable-quantile counterpart of the [[MisraGries]] frequency sketch
 * and the winsorize SCALE PATH the exact-`percentile` operator documents:
 * `percentile` collects each group's full value list into one aggregation
 * buffer (per-group memory = group size — fine for bounded groups, an
 * executor OOM for a billion-row group at 100 TB), while this sketch
 * reduces any group to ≤ ~2·compression centroids per partition, merged
 * pairwise — bounded state, no value-level exchange.
 *
 * Accuracy: centroid sizes obey the k₁ scale function
 * k(q) = (δ/2π)·asin(2q−1), whose infinite slope at q ∈ {0, 1} forces
 * singleton centroids at the extremes — relative tail accuracy, the
 * property winsorization's p01/p99 clips actually need. Rank error is
 * empirically ≲ 0.5% of n at δ = 100 regardless of how the input is
 * partitioned (TDigestSpec pins ≤ 1% under 1/4/32-partition merges of
 * uniform, lognormal, and constant-heavy streams).
 *
 * The declared winsorize QUERY keeps the exact `percentile` (sort-based
 * interpolation, same definition as DuckDB `quantile_cont`, hence a full
 * oracle); the sketch has no cross-engine twin, so like the HLL and
 * Misra-Gries sketches it is spec-pinned, not oracle-checked
 * ([[graft.operators.Curation.winsorizeSketched]] is the drop-in swap).
 */
class TDigest(compression: Int, probs: Seq[Double])
    extends Aggregator[Double, TdBuf, Seq[Double]] {
  require(compression >= 20, s"compression must be >= 20, got $compression")
  require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
    s"probs must be in [0,1], got $probs")

  private val BufferSize = 256

  def zero: TdBuf = TdBuf(Vector.empty, Vector.empty)

  def reduce(b: TdBuf, x: Double): TdBuf = {
    if (x.isNaN) return b
    val buf = b.buffer :+ x
    if (buf.size >= BufferSize) TdBuf(compress(b.centroids, buf), Vector.empty)
    else TdBuf(b.centroids, buf)
  }

  def merge(a: TdBuf, b: TdBuf): TdBuf =
    TdBuf(compress(a.centroids ++ b.centroids, a.buffer ++ b.buffer),
      Vector.empty)

  def finish(b: TdBuf): Seq[Double] = {
    val cs = compress(b.centroids, b.buffer)
    probs.map(quantile(cs, _))
  }

  /** k₁ scale: centroid i may absorb centroid i+1 only while
    * k(q_right) − k(q_left) ≤ 1 — small clusters near the tails, wide in
    * the middle. One sorted sweep, O(m log m). */
  private def compress(centroids: Seq[TdCentroid],
                       buffer: Seq[Double]): Seq[TdCentroid] = {
    val all = (centroids ++ buffer.map(TdCentroid(_, 1L)))
      .sortBy(c => (c.mean, c.weight))
    if (all.size <= 1) return all.toVector
    val total = all.map(_.weight).sum.toDouble
    def k(q: Double): Double =
      compression / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, q) - 1.0)
    val out = Vector.newBuilder[TdCentroid]
    var accMean = all.head.mean
    var accW = all.head.weight
    var qLeft = 0.0
    all.tail.foreach { c =>
      val qRight = qLeft + (accW + c.weight) / total
      if (k(qRight) - k(qLeft) <= 1.0) {
        // weighted mean update; weights are exact longs, means drift only
        // within the cluster the scale function already bounds
        accMean = (accMean * accW + c.mean * c.weight) / (accW + c.weight)
        accW += c.weight
      } else {
        out += TdCentroid(accMean, accW)
        qLeft += accW / total
        accMean = c.mean
        accW = c.weight
      }
    }
    out += TdCentroid(accMean, accW)
    out.result()
  }

  /** Quantile from the centroid summary: centroid i sits at cumulative
    * weight Wᵢ = Σ_{j<i} wⱼ + wᵢ/2; linear interpolation between the
    * bracketing centroid midpoints, clamped to the extreme means — with
    * the TIE-INTERIOR rule: a target landing strictly inside a
    * multi-sample centroid's own mass returns that centroid's mean when a
    * neighbor shares the same mean (a massive tie — 60% of a telemetry
    * stream on one value — spans several equal-mean centroids under the
    * scale function, so interior targets answer exactly instead of
    * smearing linearly across the tie's rank span; targets at the tie's
    * EDGES still interpolate, bounded by half a centroid's mass —
    * TDigestSpec pins ≤ 2% there vs ≤ 1% on smooth streams). */
  private def quantile(cs: Seq[TdCentroid], q: Double): Double = {
    if (cs.isEmpty) return Double.NaN
    if (cs.size == 1) return cs.head.mean
    val total = cs.map(_.weight).sum.toDouble
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < cs.size) {
      val w = cs(i).weight
      val tieNeighbor = (i > 0 && cs(i - 1).mean == cs(i).mean) ||
        (i + 1 < cs.size && cs(i + 1).mean == cs(i).mean)
      if (w > 1 && tieNeighbor && target >= cum + 0.5 && target <= cum + w - 0.5)
        return cs(i).mean
      val mid = cum + w / 2.0
      if (target < mid) {
        if (i == 0) return cs.head.mean
        val prevMid = cum - cs(i - 1).weight / 2.0
        val frac = (target - prevMid) / (mid - prevMid)
        return cs(i - 1).mean + frac * (cs(i).mean - cs(i - 1).mean)
      }
      cum += w
      i += 1
    }
    cs.last.mean
  }

  def bufferEncoder: Encoder[TdBuf] = Encoders.product[TdBuf]
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object TDigest {
  /** Column form: aggregate a double column into quantile estimates at
    * `probs` (array<double>, same order). */
  def quantiles(c: Column, probs: Seq[Double], compression: Int = 100): Column =
    udaf(new TDigest(compression, probs)).apply(c)
}
