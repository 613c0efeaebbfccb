package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.UnicodeNormalize
import graft.SparkSpec

/** Native Unicode normalization expression: UAX #15 forms, codegen parity,
  * NULL safety, and the already-normalized zero-copy fast path. */
class UnicodeNormalizeSpec extends AnyFunSuite with SparkSpec {

  private def one(s: String, form: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(UnicodeNormalize.of(col("t"), form).as("n"))
      .collect()(0).getString(0)
  }

  test("NFC composes combining sequences; NFD decomposes; identity on ASCII") {
    val decomposed = "café"   // e + combining acute
    val precomposed = "café"   // é
    assert(one(decomposed, "NFC") == precomposed)
    assert(one(precomposed, "NFD") == decomposed)
    assert(one("plain ascii text", "NFC") == "plain ascii text")
    // round trip
    assert(one(one(precomposed, "NFD"), "NFC") == precomposed)
  }

  test("NFKC folds compatibility characters NFC leaves alone") {
    assert(one("\ufb01le", "NFC") == "\ufb01le") // fi-ligature survives NFC
    assert(one("\ufb01le", "NFKC") == "file")      // NFKC folds it
    assert(one("\uff08\uff16\uff11\uff09", "NFKC") == "(61)") // fullwidth parens+digits
  }

  test("NULL text stays NULL; invalid form fails at construction") {
    import spark.implicits._
    val out = Seq[Option[String]](None, Some("x")).toDF("t")
      .select(UnicodeNormalize.of(col("t"), "NFC").as("n")).collect()
    assert(out(0).isNullAt(0) && out(1).getString(0) == "x")
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.UnicodeNormalize(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), "NOTAFORM")
    }
  }

  test("interpreted eval matches codegen over mixed scripts (fuzz)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pool = "aéé́ ﬁ汉字ßÅÅ"
    val rows = (1 to 200).map(_ =>
      (1 to rnd.nextInt(20)).map(_ => pool(rnd.nextInt(pool.length))).mkString)
    val df = rows.toDF("t")
    val viaExpr = df.select(UnicodeNormalize.of(col("t"), "NFC").as("n"))
      .collect().map(_.getString(0))
    val viaJava = rows.map(s =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(viaExpr.toSeq == viaJava)
  }
}
