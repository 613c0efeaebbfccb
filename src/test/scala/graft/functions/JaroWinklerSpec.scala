package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.JaroWinkler
import graft.SparkSpec

/** Native Jaro-Winkler: values pinned to DuckDB's jaro_winkler_similarity
  * bit-for-bit (probed against DuckDB 3000-pair fuzz before implementation;
  * the declared query's oracle keeps the cross-engine contract live). */
class JaroWinklerSpec extends AnyFunSuite with SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("classic values match DuckDB exactly") {
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("jellyfish", "smellyfish") == 0.8962962962962964)
    assert(jw("DwAyNE", "DuANE") == 0.8400000000000001) // case-sensitive
    assert(jw("prefixmatch_zzzz", "prefixmatch_qqqq") == 0.9) // prefix cap 4
  }

  test("boost threshold: no prefix bonus at jaro <= 0.7") {
    assert(jw("abxxxx", "abyyyy") == 0.5555555555555555) // shared prefix, no bonus
    assert(jw("ab", "ax") == 0.6666666666666666)
    assert(jw("abcdef", "fedcba") == 0.38888888888888884)
  }

  test("edges: empties are 0 (even both), equal non-empty is 1, disjoint is 0") {
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("a", "a") == 1.0)
    assert(jw("x", "y") == 0.0)
  }

  test("column form is NULL-safe and codegen matches interpreted") {
    import spark.implicits._
    val df = Seq((Some("martha"), Some("marhta")), (None, Some("x")),
      (Some("x"), None)).toDF("a", "b")
    val out = df.select(JaroWinkler.of(col("a"), col("b")).as("s")).collect()
    assert(out(0).getDouble(0) == 0.9611111111111111)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
    // interpreted == codegen over a fuzz batch
    val rnd = new scala.util.Random(5)
    val pairs = (1 to 300).map { _ =>
      def s() = (1 to rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
      (s(), s())
    }
    val viaExpr = pairs.toDF("a", "b")
      .select(JaroWinkler.of(col("a"), col("b")).as("s"))
      .collect().map(_.getDouble(0))
    assert(viaExpr.toSeq == pairs.map { case (a, b) => jw(a, b) })
  }
}
