package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Typed `Aggregator` computing the centroid (element-wise mean) of an
 * embedding column — the §2.10 custom-UDAF surface (SURVEY: the reference
 * needs no custom aggregates; this one serves the [EXT] similarity layer,
 * e.g. IVF coarse centroids or per-cluster summaries).
 *
 * Scale behavior is what makes an Aggregator the right tool: `reduce` runs
 * map-side per partition and `merge` combines partials — one (dims+1)-double
 * buffer per group per partition crosses the shuffle, never the vectors
 * themselves. Sums accumulate in double (not float) so precision loss stays
 * ~1 ulp-of-double per element regardless of group size.
 */
/** Aggregation buffer: running element sums + count. */
final case class CentroidBuf(sums: Array[Double], n: Long)

object Centroid extends Aggregator[Seq[Float], CentroidBuf, Seq[Float]] {
  type Buf = CentroidBuf
  private def Buf(sums: Array[Double], n: Long) = CentroidBuf(sums, n)

  def zero: Buf = Buf(Array.emptyDoubleArray, 0L)

  def reduce(b: Buf, v: Seq[Float]): Buf = {
    if (v == null) return b
    val sums = if (b.sums.isEmpty) new Array[Double](v.length) else b.sums
    var i = 0
    while (i < v.length && i < sums.length) { sums(i) += v(i); i += 1 }
    Buf(sums, b.n + 1)
  }

  def merge(a: Buf, b: Buf): Buf = {
    if (a.sums.isEmpty) return b
    if (b.sums.isEmpty) return a
    val out = new Array[Double](a.sums.length)
    var i = 0
    while (i < out.length) { out(i) = a.sums(i) + b.sums(i); i += 1 }
    Buf(out, a.n + b.n)
  }

  def finish(b: Buf): Seq[Float] =
    if (b.n == 0) Seq.empty
    else b.sums.map(s => (s / b.n).toFloat).toSeq

  def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  def outputEncoder: Encoder[Seq[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()

  /** Column form for DataFrame `agg`. */
  def centroid(c: Column): Column = udaf(this).apply(c)
}

/** Fixed-point buffer: exact integer element sums + count. */
final case class CentroidFixedBuf(sums: Array[Long], n: Long)

/**
 * Exact fixed-point centroid: each float component is quantized to
 * `floor(x·2^20 + 0.5)` (the ×2^20 double multiply is exact — power of
 * two) and summed in LONG, so partial aggregation is merge-ORDER-FREE:
 * integer addition commutes, and the result is bit-identical whatever the
 * partition/merge tree — unlike [[Centroid]]'s double sums, which drift by
 * fold order on a real cluster. The finished mean, `(Σ/(n·2^20))` as a
 * float, is two IEEE operations on exact integers — any engine replays it
 * bit-for-bit, which is what lets IVF training carry a cross-engine
 * oracle. Quantization bound: components |x| < 2^11 keep |term| < 2^31
 * and 2^32 rows per group under the LONG range.
 */
object CentroidFixed extends Aggregator[Seq[Float], CentroidFixedBuf, Seq[Float]] {
  type Buf = CentroidFixedBuf
  private def Buf(sums: Array[Long], n: Long) = CentroidFixedBuf(sums, n)
  private val Scale = 1048576.0 // 2^20

  def zero: Buf = Buf(Array.emptyLongArray, 0L)

  def reduce(b: Buf, v: Seq[Float]): Buf = {
    if (v == null) return b
    val sums = if (b.sums.isEmpty) new Array[Long](v.length) else b.sums
    var i = 0
    while (i < v.length && i < sums.length) {
      sums(i) += math.floor(v(i).toDouble * Scale + 0.5).toLong
      i += 1
    }
    Buf(sums, b.n + 1)
  }

  def merge(a: Buf, b: Buf): Buf = {
    if (a.sums.isEmpty) return b
    if (b.sums.isEmpty) return a
    val out = new Array[Long](a.sums.length)
    var i = 0
    while (i < out.length) { out(i) = a.sums(i) + b.sums(i); i += 1 }
    Buf(out, a.n + b.n)
  }

  def finish(b: Buf): Seq[Float] =
    if (b.n == 0) Seq.empty
    else b.sums.map(s => (s.toDouble / (b.n * Scale)).toFloat).toSeq

  def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  def outputEncoder: Encoder[Seq[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()

  /** Column form for DataFrame `agg`. */
  def centroid(c: Column): Column = udaf(this).apply(c)
}
