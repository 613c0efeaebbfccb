package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SortedOverlapGate
import graft.SparkSpec

/** The fused merge-intersection + θ-gate expression behind the exact
  * jaccard verify: equality with the array_intersect + integer-gate
  * composition, early-exit soundness, null semantics, codegen parity. */
class SortedOverlapSpec extends AnyFunSuite with SparkSpec {

  /** Random distinct-sorted token arrays over a small vocab (heavy
    * overlap, lots of gate-boundary pairs). */
  private lazy val sets = {
    val sq = spark
    import sq.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j",
      "k", "l", "m", "n")
    (0 until 80).map { i =>
      (i.toLong,
        Seq.fill(1 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
          .distinct.sorted.toArray)
    }.toDF("id", "ts")
  }

  test("gate expression equals size(array_intersect) + integer gate on " +
      "every pair (pass → size, fail → -1), interpreted AND codegen") {
    for ((num, den) <- Seq((4, 5), (7, 10), (1, 1), (1, 3))) {
      val pairs = sets.as("a").crossJoin(sets.as("b"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.ts").as("ta"), col("b.ts").as("tb"))
      val cmp = pairs.select(
        SortedOverlapGate.of(col("ta"), col("tb"), num, den).as("got"),
        size(array_intersect(col("ta"), col("tb"))).cast("long").as("i"),
        size(col("ta")).cast("long").as("la"),
        size(col("tb")).cast("long").as("lb"))
        .withColumn("want",
          when(lit(den.toLong) * col("i") >=
            lit(num.toLong) * (col("la") + col("lb") - col("i")),
            col("i")).otherwise(lit(-1L)))
      assert(cmp.filter(col("got") =!= col("want")).count() == 0,
        s"theta $num/$den")
    }
  }

  test("interpreted eval (nullSafeEval) agrees with a scala brute force — " +
      "the non-codegen fallback path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val rnd = new scala.util.Random(29)
    val vocab = ('a' to 'n').map(_.toString)
    def mk(xs: Seq[String]) = Literal.create(xs, ArrayType(StringType))
    for (_ <- 1 to 200; (num, den) <- Seq((4, 5), (7, 10))) {
      val a = Seq.fill(1 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .distinct.sorted
      val b = Seq.fill(1 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .distinct.sorted
      val o = a.toSet.intersect(b.toSet).size.toLong
      val want = if (den * o >= num * (a.size + b.size - o)) o else -1L
      val got = SortedOverlapGate(mk(a), mk(b), num, den).eval(null)
      assert(got == want, s"$a vs $b at $num/$den: $got != $want")
    }
  }

  test("CONTAINMENT gate equals size(array_intersect) + asymmetric " +
      "integer gate den*i >= num*la on every ORDERED pair, interpreted " +
      "AND codegen") {
    import org.apache.spark.sql.graft.SortedContainGate
    for ((num, den) <- Seq((9, 10), (4, 5), (1, 1), (1, 3))) {
      val pairs = sets.as("a").crossJoin(sets.as("b"))
        .filter(col("a.id") =!= col("b.id")) // ordered: both orientations
        .select(col("a.ts").as("ta"), col("b.ts").as("tb"))
      val cmp = pairs.select(
        SortedContainGate.of(col("ta"), col("tb"), num, den).as("got"),
        size(array_intersect(col("ta"), col("tb"))).cast("long").as("i"),
        size(col("ta")).cast("long").as("la"))
        .withColumn("want",
          when(lit(den.toLong) * col("i") >= lit(num.toLong) * col("la"),
            col("i")).otherwise(lit(-1L)))
      assert(cmp.filter(col("got") =!= col("want")).count() == 0,
        s"theta $num/$den")
    }
  }

  test("containment gate interpreted eval agrees with scala brute force") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.SortedContainGate
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val rnd = new scala.util.Random(31)
    val vocab = ('a' to 'n').map(_.toString)
    def mk(xs: Seq[String]) = Literal.create(xs, ArrayType(StringType))
    for (_ <- 1 to 200; (num, den) <- Seq((9, 10), (1, 2))) {
      val a = Seq.fill(1 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .distinct.sorted
      val b = Seq.fill(1 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .distinct.sorted
      val o = a.toSet.intersect(b.toSet).size.toLong
      val want = if (den * o >= num * a.size) o else -1L
      val got = SortedContainGate(mk(a), mk(b), num, den).eval(null)
      assert(got == want, s"$a in $b at $num/$den: $got != $want")
    }
  }

  test("null input yields null; disjoint and identical sets hit both ends") {
    val sq = spark
    import sq.implicits._
    val df = Seq(
      (Array("a", "b"), null.asInstanceOf[Array[String]]),
      (Array("a", "b"), Array("c", "d")),
      (Array("a", "b", "c"), Array("a", "b", "c"))
    ).toDF("a", "b")
    val r = df.select(SortedOverlapGate.of(col("a"), col("b"), 4, 5)).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getLong(0) == -1L) // disjoint: gate unreachable, early exit
    assert(r(2).getLong(0) == 3L)  // clones: full overlap passes any theta
  }

  test("SortedLongIntersect equals array_intersect on random sorted " +
      "distinct bigint arrays (elements AND order), null-safe") {
    val sq = spark
    import sq.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (0 until 120).map { i =>
      (i.toLong,
        Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(25).toLong)
          .distinct.sorted.toArray)
    }.toDF("id", "xs")
    val pairs = rows.as("a").crossJoin(rows.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.xs").as("xa"), col("b.xs").as("xb"))
    val cmp = pairs.select(
      org.apache.spark.sql.graft.SortedLongIntersect
        .of(col("xa"), col("xb")).as("got"),
      array_intersect(col("xa"), col("xb")).as("want"))
    // array_intersect keeps first-array order = ascending here, so the
    // comparison pins order too
    assert(cmp.filter(not(col("got") <=> col("want"))).count() == 0)
    // null input -> null (the no-out-edges left-join row); explode drops it
    val n = rows.limit(1).select(
      org.apache.spark.sql.graft.SortedLongIntersect
        .of(col("xs"), lit(null).cast("array<bigint>")).as("g")).collect()
    assert(n(0).isNullAt(0))
    // empty intersection -> empty array (explode emits nothing)
    val e = Seq((Array(1L, 3L), Array(2L, 4L))).toDF("a", "b")
      .select(org.apache.spark.sql.graft.SortedLongIntersect
        .of(col("a"), col("b")).as("g")).collect()
    assert(e(0).getSeq[Long](0).isEmpty)
  }
}
