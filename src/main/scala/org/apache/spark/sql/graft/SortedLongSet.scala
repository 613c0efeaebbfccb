/*
 * Lives under org.apache.spark.sql.* because the expression-integration API
 * (ExpressionUtils.column / private[sql] expressions) is not public — the
 * established pattern for third-party native-expression packages.
 */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Insert-only open-addressed primitive long set — the aggregation buffer
  * of [[SortedLongSet]]. Zero is kept out-of-table (0 doubles as the
  * empty-slot sentinel); linear probing over a power-of-two table at
  * ≤ 0.7 load; keys are finalizer-mixed so sequential ids don't cluster.
  * No boxing anywhere — the whole point vs `collect_set`'s
  * OpenHashSet[Any] (one AnyRef box per distinct value per partial). */
final class LongSetBuffer(initialCapacity: Int) {
  private var cap = {
    var c = 8
    while (c < initialCapacity) c <<= 1
    c
  }
  private var keys = new Array[Long](cap)
  private var n = 0
  private var hasZero = false

  private def mix(k: Long): Int = {
    var h = k * -7046029254386353131L
    h ^= h >>> 32
    (h & (cap - 1)).toInt
  }

  def add(k: Long): Unit = {
    if (k == 0L) { hasZero = true; return }
    var i = mix(k)
    while (keys(i) != 0L) {
      if (keys(i) == k) return
      i = (i + 1) & (cap - 1)
    }
    keys(i) = k
    n += 1
    if (n * 10 >= cap * 7) grow()
  }

  private def grow(): Unit = {
    val old = keys
    cap <<= 1
    keys = new Array[Long](cap)
    n = 0
    var i = 0
    while (i < old.length) {
      if (old(i) != 0L) add(old(i))
      i += 1
    }
  }

  def size: Int = n + (if (hasZero) 1 else 0)

  /** Distinct values ascending — 0 first when present. */
  def toSortedArray: Array[Long] = {
    val out = new Array[Long](size)
    var j = 0
    if (hasZero) { out(0) = 0L; j = 1 }
    var i = 0
    while (i < keys.length) {
      if (keys(i) != 0L) { out(j) = keys(i); j += 1 }
      i += 1
    }
    java.util.Arrays.sort(out)
    out
  }

  def foreachKey(f: Long => Unit): Unit = {
    if (hasZero) f(0L)
    var i = 0
    while (i < keys.length) {
      if (keys(i) != 0L) f(keys(i))
      i += 1
    }
  }
}

/** `sorted_long_set(x)` ≡ `array_sort(collect_set(x))` for LONG inputs
  * (NULLs ignored, ascending distinct output) with a PRIMITIVE
  * aggregation buffer: `collect_set` pays one AnyRef box per distinct
  * value per partial plus a separate interpreted `array_sort` pass;
  * this keeps the fold in a flat long table and sorts once at eval into
  * an UnsafeArrayData. Partial aggregation (map-side combine) works like
  * any TypedImperativeAggregate — buffers serialize as raw longs.
  * Element-equality to the collect_set form is spec-pinned
  * (SortedLongSetSpec); the pair-stream folds (Graph.itemPairs,
  * neighbor-set builds) are the production callers. */
case class SortedLongSet(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongSetBuffer]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "sorted_long_set"

  override def createAggregationBuffer(): LongSetBuffer = new LongSetBuffer(8)

  override def update(buf: LongSetBuffer, input: InternalRow): LongSetBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: LongSetBuffer, b: LongSetBuffer): LongSetBuffer = {
    b.foreachKey(a.add)
    a
  }

  override def eval(buf: LongSetBuffer): Any =
    UnsafeArrayData.fromPrimitiveArray(buf.toSortedArray)

  override def serialize(buf: LongSetBuffer): Array[Byte] = {
    // raw table order — deserialize re-inserts into a hash table, so the
    // O(n log n) sort belongs only in eval(), never per shipped partial
    val bb = ByteBuffer.allocate(buf.size * 8)
    buf.foreachKey(bb.putLong(_))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongSetBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bytes.length / 8
    val buf = new LongSetBuffer(math.max(8, n * 2))
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SortedLongSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SortedLongSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SortedLongSet =
    copy(child = newChild)
}

object SortedLongSet {
  /** Column form: `SortedLongSet.of(col)` in a `groupBy().agg(...)`. */
  def of(c: Column): Column =
    ExpressionUtils.column(
      SortedLongSet(ExpressionUtils.expression(c)).toAggregateExpression())
}
