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
