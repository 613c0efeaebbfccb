package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries buffer: at most k (token → count) entries. */
final case class MgBuf(counts: Map[String, Long])

/** One reported heavy hitter: the sketch's count is a LOWER bound on the
  * true frequency (decrements only ever subtract). */
final case class MgHit(token: String, lower_bound: Long)

/**
 * Misra-Gries heavy-hitters sketch as a typed `Aggregator` (§2.10 custom-
 * UDAF surface) — the frequency analogue of the HLL cardinality sketch:
 * bounded k-entry state per partition, merged pairwise, so a 100 TB token
 * stream reduces with NO token-level exchange (each partition ships one
 * k-entry map to the final merge).
 *
 * Guarantees (the classical ones, pinned by MisraGriesSpec):
 *  - every reported count is a LOWER bound on the true frequency;
 *  - the under-estimate is at most n/(k+1) for a length-n stream — this
 *    holds across arbitrary partitionings and merge trees (Agarwal et al.,
 *    "Mergeable Summaries": the merge below — pointwise sum, then subtract
 *    the (k+1)-th largest count — preserves the bound);
 *  - hence every token with true frequency > n/(k+1) is present.
 *
 * The REPORTED counts may differ slightly between merge trees (the bound,
 * not the estimate, is partition-invariant) — which is why the declared
 * query surface uses the exact [[graft.operators.TextAnalysis.heavyHitters]]
 * and this sketch is spec-pinned instead, like the approx-distinct HLL.
 */
class MisraGries(k: Int) extends Aggregator[String, MgBuf, Seq[MgHit]] {
  require(k >= 1, s"k must be >= 1, got $k")

  def zero: MgBuf = MgBuf(Map.empty)

  def reduce(b: MgBuf, token: String): MgBuf = {
    if (token == null) return b
    val m = b.counts
    m.get(token) match {
      case Some(c) => MgBuf(m.updated(token, c + 1))
      case None if m.size < k => MgBuf(m.updated(token, 1L))
      case None =>
        // decrement-all: pay one count from every tracked entry (and,
        // conceptually, from the new token) — drop entries reaching zero
        MgBuf(m.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None })
    }
  }

  def merge(a: MgBuf, b: MgBuf): MgBuf = {
    if (a.counts.isEmpty) return b
    if (b.counts.isEmpty) return a
    // mergeable-summaries rule: pointwise sum, then if over capacity
    // subtract the (k+1)-th largest count from everything and drop <= 0
    val summed = b.counts.foldLeft(a.counts) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) MgBuf(summed)
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      MgBuf(summed.flatMap { case (t, c) =>
        if (c > cut) Some(t -> (c - cut)) else None
      })
    }
  }

  def finish(b: MgBuf): Seq[MgHit] =
    b.counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => MgHit(t, c) }

  def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  def outputEncoder: Encoder[Seq[MgHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[MgHit]]()
}

object MisraGries {
  /** Column form: aggregate a string column into the top-≤k sketch. */
  def sketch(c: Column, k: Int): Column = udaf(new MisraGries(k)).apply(c)
}
