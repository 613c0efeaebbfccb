/*
 * Lives under org.apache.spark.sql.* because the expression-integration API
 * (ExpressionUtils.column / AbstractDataType in ExpectsInputTypes) is
 * private[sql] — same pattern as TokenKernels/MinHashSigs.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Unicode normalization (SURVEY §2.10 extension surface; X4
 * corpus-cleaning adjunct): canonical/compatibility normal forms over a
 * string column, codegen'd, NULL-safe.
 *
 * Why an Expression and not a UDF: normalization sits in the same
 * corpus-cleaning hot path as the tokenize kernels (every document, every
 * ingest), and a Scala UDF would box a String per row AND black-box the
 * plan. This stays inside whole-stage codegen and short-circuits to the
 * INPUT buffer (zero allocation) when the text is already normalized —
 * the overwhelmingly common case for ASCII-heavy corpora, checked by
 * `Normalizer.isNormalized`'s quick-check pass.
 *
 * Forms: NFC/NFD/NFKC/NFKD (java.text.Normalizer, UAX #15). Web-corpus
 * pipelines normalize to NFC at ingest (byte-identical text dedups
 * exactly); tokenizer-feeding paths use NFKC (folds ligatures/width
 * variants). The NFC form has a FULL cross-engine oracle — DuckDB ships
 * `nfc_normalize`, and both engines implement the same UAX #15 canonical
 * composition — the other forms are spec-pinned (DuckDB has no NFKC).
 */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {
  // fail at construction, not per row
  java.text.Normalizer.Form.valueOf(form)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = s"unicode_normalize_$form"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.graft.UnicodeNormalize.normalize($c, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  /** Shared by interpreted eval and generated code. Returns the INPUT
    * object untouched when already normalized (quick-check fast path). */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  /** Column form — usable without any registry. */
  def of(text: Column, form: String = "NFC"): Column =
    ExpressionUtils.column(UnicodeNormalize(ExpressionUtils.expression(text), form))
}
