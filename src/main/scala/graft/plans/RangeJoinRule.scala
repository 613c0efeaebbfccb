package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

/**
 * Optimizer rule: rewrite point-in-interval inequality joins into binned
 * equi-joins — the whole-plan form of [[graft.operators.Temporal.rangeJoinBinned]],
 * applied TRANSPARENTLY to raw SQL.
 *
 * Spark plans a join whose only usable conjuncts are inequalities as a
 * BroadcastNestedLoopJoin (or a cartesian product) — O(n·m) work per key
 * and the classic 100 TB job killer, because users writing natural SQL
 * (`ON c.t >= p.lo AND c.t < p.hi AND c.k = p.k`) get the pathological
 * plan by default. This rule detects that shape and rewrites it:
 *
 *   points   → Project  … + __graft_bin = point div W
 *   intervals→ Generate … explode(sequence(lo div W, greatest(lo, hi-1) div W))
 *   join     → equi keys + bin equality (hash-partitionable!)
 *   filter   → the ORIGINAL bound conjuncts, re-applied verbatim
 *
 * Semantics are exactly preserved: a point maps to one bin and an interval
 * explodes to each covered bin once (sequence is strictly increasing), so a
 * qualifying pair meets exactly once; non-qualifying same-bin pairs die in
 * the re-applied bounds filter; NULL points/bounds produce NULL bins or
 * empty sequences and are dropped just as the original inner-join condition
 * dropped them. Truncating `div` keeps the covering property for negative
 * values too (trunc is monotone, and `greatest` pins stop ≥ start).
 *
 * Activation: set `spark.graft.rangeJoin.binWidth` (same unit as the join
 * bounds; pick ≈ the typical interval length) — 0/unset disables. The same
 * width applies to every rewritten join in the session, mirroring the
 * range-join bin hints of the commercial engines. Guard: joins whose equi
 * side already carries a bin column (this rule's output, or the manual
 * operator's `__bin`) are left alone, so predicate-pushdown re-planting the
 * bounds inside the rewritten join cannot re-trigger the rewrite.
 *
 * Registered via [[graft.GraftExtensions]] (`injectOptimizerRule`) or
 * `spark.experimental.extraOptimizations`.
 */
object RangeJoinRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rangeJoin.binWidth"
  private val BinName = "__graft_bin"
  private val GuardNames = Set(BinName, "__bin")

  private def binWidth: Long =
    try SQLConf.get.getConfString(ConfKey, "0").toLong
    catch { case _: NumberFormatException => 0L }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binWidth
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j, w).getOrElse(j)
    }
  }

  /** One inequality conjunct normalized to `small (< | <=) large`. A bare
    * comparison can't tell us which operand is the probe point — `p <= hi`
    * and `lo <= p` are the same expression class — so classification into
    * lower/upper bounds happens at PAIRING time: the point is whatever
    * expression appears as `large` in one conjunct and `small` in another. */
  private case class Cmp(original: Expression, small: Expression,
                         large: Expression, strict: Boolean)

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = {
    val left = j.left; val right = j.right
    def fromLeft(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def fromRight(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(right.outputSet)
    def sided(a: Expression, b: Expression) =
      (fromLeft(a) && fromRight(b)) || (fromRight(a) && fromLeft(b))

    val equis = Seq.newBuilder[EqualTo]
    val cmps = Seq.newBuilder[Cmp]
    var unsupported = false
    conjuncts(j.condition.get).foreach {
      case eq @ EqualTo(a, b) if sided(a, b) => equis += eq
      case c @ GreaterThanOrEqual(a, b) if sided(a, b) && integral(a) && integral(b) =>
        cmps += Cmp(c, b, a, strict = false)
      case c @ GreaterThan(a, b) if sided(a, b) && integral(a) && integral(b) =>
        cmps += Cmp(c, b, a, strict = true)
      case c @ LessThanOrEqual(a, b) if sided(a, b) && integral(a) && integral(b) =>
        cmps += Cmp(c, a, b, strict = false)
      case c @ LessThan(a, b) if sided(a, b) && integral(a) && integral(b) =>
        cmps += Cmp(c, a, b, strict = true)
      case _ => unsupported = true
    }
    if (unsupported) return None
    // already-binned joins (this rule's own output after predicate
    // pushdown, or the manual operator's) must not re-trigger
    if (equis.result().exists(_.references.exists(a => GuardNames(a.name))))
      return None

    // pick a (lower, upper) pair over the SAME point expression: the point
    // is `large` of the lower-bound conjunct and `small` of the upper-bound
    // one (lo <= p AND p <= hi), regardless of how each was spelled
    val all = cmps.result()
    val pair = (for {
      l <- all; u <- all
      if (l ne u) && l.large.semanticEquals(u.small)
    } yield (l, u)).headOption
    pair.flatMap { case (l, u) =>
      val p = l.large
      val pointOnLeft = fromLeft(p)
      if (pointOnLeft != fromLeft(l.small) && pointOnLeft != fromLeft(u.large)) {
        val (pointSide, ivSide) = if (pointOnLeft) (left, right) else (right, left)
        val wLit = Literal(w)
        val pBin = Alias(new IntegralDivide(asLong(p), wLit), BinName)()
        val pointPlan = Project(pointSide.output :+ pBin, pointSide)
        // upper bound is exclusive when strict; for <= the end point itself
        // is in range, so use hi rather than hi-1 (one extra bin at worst)
        val hiEnd =
          if (u.strict) Subtract(asLong(u.large), Literal(1L))
          else asLong(u.large)
        val start = new IntegralDivide(asLong(l.small), wLit)
        val stop = new IntegralDivide(Greatest(Seq(asLong(l.small), hiEnd)), wLit)
        val binAttr = AttributeReference(BinName, LongType, nullable = false)()
        // Sequence is TimeZoneAwareExpression: the analyzer's ResolveTimeZone
        // normally fills timeZoneId, but optimizer-constructed expressions
        // must set it or the plan is unresolved
        val seq = Sequence(start, stop, Some(Literal(1L)),
          Some(SQLConf.get.sessionLocalTimeZone))
        val ivPlan = Generate(Explode(seq),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(binAttr), child = ivSide)
        val (newLeft, newRight) =
          if (pointOnLeft) (pointPlan, ivPlan) else (ivPlan, pointPlan)
        val joinCond = (equis.result() :+ EqualTo(pBin.toAttribute, binAttr))
          .reduce[Expression](And)
        val rebuilt = Join(newLeft, newRight, Inner, Some(joinCond), j.hint)
        val bounds = all.map(_.original).reduce[Expression](And)
        Some(Project(j.output, Filter(bounds, rebuilt)))
      } else None
    }
  }
}
