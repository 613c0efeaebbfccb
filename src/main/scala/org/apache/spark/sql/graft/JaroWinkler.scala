/*
 * Lives under org.apache.spark.sql.* for the private[sql] expression
 * integration API — same pattern as TokenKernels/Normalize.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Jaro-Winkler similarity (SURVEY §2.10 extension surface) — the
 * standard fuzzy string metric for entity resolution and name matching,
 * which Spark lacks (it ships only levenshtein). Codegen'd binary
 * expression; NULL-safe (either side NULL → NULL).
 *
 * Semantics are pinned BIT-FOR-BIT to DuckDB's `jaro_winkler_similarity`
 * (fuzz-verified over 3000 random pairs before implementation): standard
 * Jaro with match window floor(max(l1,l2)/2)−1, half-transposition count;
 * Winkler prefix bonus `j + l·0.1·(1−j)` with the common prefix capped at
 * 4, applied ONLY when jaro > 0.7 (the classic boost threshold); empty
 * strings score 0.0 (even empty-vs-empty — DuckDB's convention), equal
 * non-empty strings 1.0. The float math reproduces DuckDB's operation
 * order (`(m/l1 + m/l2 + (m−t)/m)/3`, left-to-right), so the declared
 * query carries a full value-hash oracle.
 *
 * Comparison unit is the UTF-16 char, which equals DuckDB's byte-wise
 * comparison for ASCII inputs (the oracle query uses ASCII columns);
 * non-ASCII pairs may differ from DuckDB in the match-window geometry,
 * exactly as any two byte-vs-codepoint implementations do.
 */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Shared by interpreted eval and generated code. */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var matched = false
      while (j <= hi && !matched) {
        if (!m2(j) && a.charAt(i) == b.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of a vs matched chars of b, in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3
    if (jaro > 0.7) {
      var l = 0
      val cap = math.min(4, math.min(l1, l2))
      while (l < cap && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1 - jaro)
    } else jaro
  }

  /** Column form — usable without any registry. */
  def of(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinkler(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
