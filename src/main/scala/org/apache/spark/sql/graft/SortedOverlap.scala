/*
 * Lives under org.apache.spark.sql.* because the expression-integration API
 * it builds on (ExpressionUtils.column / AbstractDataType in ExpectsInputTypes)
 * is private[sql] — the established pattern for third-party native
 * expressions (see CosineSim.scala).
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/**
 * Native Catalyst expression: the VERIFY step of the exact-recall jaccard
 * join, fused into one merge pass. Inputs are two LEXICOGRAPHICALLY sorted,
 * distinct-element `array<string>` token sets (the shape
 * `sort_array(DistinctTokens.of(text))` produces); output is the
 * intersection size o when the jaccard gate den·o ≥ num·(|A|+|B|−o)
 * passes, and −1 when it fails.
 *
 * Why a custom Expression (SURVEY §2.10 preference order): the built-in
 * `size(array_intersect(a, b))` builds a hash set of one side PER PAIR and
 * hashes every string of the other — for the candidate-verify stage doing
 * millions of pair evaluations it is the whole operator's hot loop. Sorted
 * inputs admit a linear MERGE intersection (binary `UTF8String.compareTo`,
 * no hashing, no allocation) — and folding the θ gate into the loop adds
 * the classic PPJoin verify EARLY EXIT: o can never exceed
 * o + min(remaining_a, remaining_b), so the merge aborts the moment the
 * bound drops below α = ⌈num·(|A|+|B|)/(num+den)⌉. Failing pairs (the
 * majority on an adversarial corpus) terminate in a fraction of the merge.
 *
 * EXACT by construction — the merge counts the same intersection
 * `array_intersect` does (distinct sorted inputs), and the early exit only
 * fires when the gate is already unreachable; a spec pins equality against
 * the `array_intersect` + integer-gate composition on random corpora.
 */
@ExpressionDescription(
  usage = "sorted_overlap_gate(a, b) - intersection size of two sorted " +
    "string arrays, or -1 when the jaccard theta gate fails.")
case class SortedOverlapGate(left: Expression, right: Expression,
                             thetaNum: Int, thetaDen: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(thetaNum > 0 && thetaDen > 0 && thetaNum <= thetaDen,
    s"theta must be a rational in (0,1], got $thetaNum/$thetaDen")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val la = xs.numElements()
    val lb = ys.numElements()
    // α = smallest overlap satisfying den·o ≥ num·(la+lb−o)
    val alpha = (thetaNum.toLong * (la + lb) + thetaNum + thetaDen - 1) /
      (thetaNum + thetaDen)
    var i = 0; var j = 0; var o = 0L
    while (i < la && j < lb) {
      if (o + math.min(la - i, lb - j) < alpha) return -1L
      val c = xs.getUTF8String(i).compareTo(ys.getUTF8String(j))
      if (c == 0) { o += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    if (o >= alpha) o else -1L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val la = ctx.freshName("la")
      val lb = ctx.freshName("lb")
      val alpha = ctx.freshName("alpha")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val o = ctx.freshName("o")
      val c = ctx.freshName("c")
      val rem = ctx.freshName("rem")
      s"""
         |int $la = $a.numElements();
         |int $lb = $b.numElements();
         |long $alpha = (${thetaNum}L * ($la + $lb) + ${thetaNum + thetaDen} - 1)
         |  / ${thetaNum + thetaDen};
         |int $i = 0; int $j = 0; long $o = 0L;
         |while ($i < $la && $j < $lb) {
         |  long $rem = ($la - $i) < ($lb - $j) ? ($la - $i) : ($lb - $j);
         |  if ($o + $rem < $alpha) { $o = -1L; break; }
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $o++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = ($o >= $alpha) ? $o : -1L;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedOverlapGate =
    copy(left = l, right = r)
}

object SortedOverlapGate {
  /** Column form — usable without any registry. */
  def of(a: Column, b: Column, thetaNum: Int, thetaDen: Int): Column =
    ExpressionUtils.column(SortedOverlapGate(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      thetaNum, thetaDen))
}

/**
 * Merge-count intersection of two SORTED, distinct-element `array<bigint>`
 * columns — the hot loop of the edge-iterator triangle count
 * (graft.operators.Graph.triangleCount): per oriented edge (s, t) the
 * triangle contribution is |N⁺(s) ∩ N⁺(t)|, and over millions of edges
 * `size(array_intersect(a, b))` re-builds a per-pair hash set and boxes
 * every element, while sorted adjacency arrays admit this linear primitive
 * merge — two `getLong` cursors, zero allocation, whole-stage codegen'd.
 * Null input → null (sum/aggregate callers skip it, matching the
 * no-out-edges ⇒ empty-intersection semantics).
 */
@ExpressionDescription(
  usage = "sorted_long_overlap(a, b) - intersection size of two sorted " +
    "distinct bigint arrays.")
case class SortedLongOverlap(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val la = xs.numElements()
    val lb = ys.numElements()
    var i = 0; var j = 0; var o = 0L
    while (i < la && j < lb) {
      val x = xs.getLong(i); val y = ys.getLong(j)
      if (x == y) { o += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    o
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val la = ctx.freshName("la")
      val lb = ctx.freshName("lb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val o = ctx.freshName("o")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $la = $a.numElements();
         |int $lb = $b.numElements();
         |int $i = 0; int $j = 0; long $o = 0L;
         |while ($i < $la && $j < $lb) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $o++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $o;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongOverlap =
    copy(left = l, right = r)
}

object SortedLongOverlap {
  /** Column form — usable without any registry. */
  def of(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedLongOverlap(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/**
 * ELEMENTS twin of [[SortedLongOverlap]]: the merge intersection of two
 * sorted distinct `array<bigint>`s with the common ELEMENTS kept (ascending
 * — the order both inputs share), for the triangle-corner stream where each
 * common neighbor w names a triangle (s, t, w) and must survive to the
 * corner explode. Replaces `array_intersect` (hash-set build + per-element
 * hashing PER EDGE) with one linear merge over primitive longs — no
 * hashing, one exact-sized allocation. Null input → null (the
 * no-out-edges left join; `explode` then drops the row, matching
 * `explode(array_intersect(a, NULL))`).
 */
@ExpressionDescription(
  usage = "sorted_long_intersect(a, b) - merge intersection (elements, " +
    "ascending) of two sorted distinct bigint arrays.")
case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val la = xs.numElements()
    val lb = ys.numElements()
    val buf = new Array[Long](math.min(la, lb))
    var i = 0; var j = 0; var o = 0
    while (i < la && j < lb) {
      val x = xs.getLong(i); val y = ys.getLong(j)
      if (x == y) { buf(o) = x; o += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(buf, o))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val la = ctx.freshName("la")
      val lb = ctx.freshName("lb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val o = ctx.freshName("o")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val buf = ctx.freshName("buf")
      s"""
         |int $la = $a.numElements();
         |int $lb = $b.numElements();
         |long[] $buf = new long[$la < $lb ? $la : $lb];
         |int $i = 0; int $j = 0; int $o = 0;
         |while ($i < $la && $j < $lb) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $buf[$o++] = $x; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray(
         |    java.util.Arrays.copyOf($buf, $o));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongIntersect =
    copy(left = l, right = r)
}

object SortedLongIntersect {
  /** Column form — usable without any registry. */
  def of(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedLongIntersect(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/**
 * CONTAINMENT twin of [[SortedOverlapGate]]: the verify step of the exact
 * set-containment join, fused into one merge pass. Inputs are two
 * lexicographically sorted, distinct-element `array<string>` token sets;
 * output is the intersection size o when the containment gate
 * den·o ≥ num·|A| passes (c(A ⊆ B) = |A∩B|/|A| ≥ num/den, LEFT side
 * contained), and −1 when it fails. The early-exit bound is the same
 * remaining-elements argument with the asymmetric α = ⌈num·|A|/den⌉ —
 * a pair whose residual merge can no longer reach α aborts immediately.
 * Exact by construction for the same reason as the jaccard gate; the
 * shared spec pins equality against `array_intersect` + integer gate.
 */
@ExpressionDescription(
  usage = "sorted_contain_gate(a, b) - intersection size of two sorted " +
    "string arrays, or -1 when the containment theta gate (on the left " +
    "array) fails.")
case class SortedContainGate(left: Expression, right: Expression,
                             thetaNum: Int, thetaDen: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(thetaNum > 0 && thetaDen > 0 && thetaNum <= thetaDen,
    s"theta must be a rational in (0,1], got $thetaNum/$thetaDen")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val la = xs.numElements()
    val lb = ys.numElements()
    // α = smallest overlap satisfying den·o ≥ num·la
    val alpha = (thetaNum.toLong * la + thetaDen - 1) / thetaDen
    var i = 0; var j = 0; var o = 0L
    while (i < la && j < lb) {
      if (o + math.min(la - i, lb - j) < alpha) return -1L
      val c = xs.getUTF8String(i).compareTo(ys.getUTF8String(j))
      if (c == 0) { o += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    if (o >= alpha) o else -1L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val la = ctx.freshName("la")
      val lb = ctx.freshName("lb")
      val alpha = ctx.freshName("alpha")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val o = ctx.freshName("o")
      val c = ctx.freshName("c")
      val rem = ctx.freshName("rem")
      s"""
         |int $la = $a.numElements();
         |int $lb = $b.numElements();
         |long $alpha = (${thetaNum}L * $la + ${thetaDen} - 1) / ${thetaDen};
         |int $i = 0; int $j = 0; long $o = 0L;
         |while ($i < $la && $j < $lb) {
         |  long $rem = ($la - $i) < ($lb - $j) ? ($la - $i) : ($lb - $j);
         |  if ($o + $rem < $alpha) { $o = -1L; break; }
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $o++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = ($o >= $alpha) ? $o : -1L;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedContainGate =
    copy(left = l, right = r)
}

object SortedContainGate {
  /** Column form — usable without any registry. */
  def of(a: Column, b: Column, thetaNum: Int, thetaDen: Int): Column =
    ExpressionUtils.column(SortedContainGate(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      thetaNum, thetaDen))
}
