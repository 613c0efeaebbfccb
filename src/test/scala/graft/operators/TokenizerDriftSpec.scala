package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.SparkSpec

/** Drift guard for the tokenizer CONTRACT shared by the md5-witness HOF
  * path ([[Dedup.tokenSets]]) and the fused native kernel path
  * ([[org.apache.spark.sql.graft.TokenSetHashes]]).
  *
  * TokenKernelProps fuzz-pins the kernel against a String-level reference
  * at the JVM level; this property pins BOTH Spark-level paths — witness
  * and production — to the same independent reference tokenizer
  * (`text.toLowerCase.split(" ").filter(_.nonEmpty)`) over GENERATED
  * corpora, comparing the doc PARTITIONS their set identities induce.
  * The vocabulary is chosen to expose every way the implementations
  * could drift apart: tabs/newlines INSIDE tokens (space-only splitting —
  * a whitespace regex would split these), NBSP (not a separator),
  * multi-byte UTF-8 (the byte-span kernel's risk area), case-folding
  * across scripts, empty docs, runs/leading/trailing separators. A
  * future edit that changes tokenization semantics in EITHER path fails
  * this spec for that path alone — the witness and production pair sets
  * can never silently diverge. */
object TokenizerDriftSpec extends Properties("TokenizerDrift") {

  // Spark actions per sample — keep the sample count deliberate, not 100
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  /** The contract, written a third way (plain Scala, no Spark). */
  private def refTokens(text: String): Seq[String] =
    text.toLowerCase.split(" ", -1).toSeq.filter(_.nonEmpty)

  private val word: Gen[String] = Gen.oneOf(
    "fox", "Fox", "FOX", "naïve", "Über", "χ²", "a\tb", "c\nd", "x", "123",
    "---", " nbsp", "ΣΙΣΥΦΟΣ", "σισυφος")
  private val sep: Gen[String] = Gen.oneOf(" ", "  ", "   ")
  private val doc: Gen[String] = for {
    n <- Gen.choose(0, 8)
    ws <- Gen.listOfN(n, word)
    ss <- Gen.listOfN(n + 1, sep)
  } yield ss.head + ws.zip(ss.tail).map { case (w, s) => w + s }.mkString

  property("HOF and kernel set identities partition docs like the reference tokenizer") =
    forAll(Gen.listOfN(14, doc)) { texts =>
      val docsDf = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // ground truth: ids partitioned by their reference token SET
      val want = texts.zipWithIndex
        .map { case (t, i) => i.toLong -> refTokens(t).toSet }
        .filter(_._2.nonEmpty)
        .groupBy(_._2).values.map(_.map(_._1).toSet).toSet

      val hofRows = Dedup.tokenSets(docsDf, "doc_id", "text")
        .select($"doc_id", $"__set_key", $"toks").collect()
      val hofPart = hofRows.groupBy(_.getString(1)).values
        .map(_.map(_.getLong(0)).toSet).toSet
      // the HOF toks column must BE the reference sorted-distinct stream
      // (vocab is BMP-only, where UTF8String byte order = String order)
      val hofToks = hofRows.forall { r =>
        r.getSeq[String](2) == refTokens(texts(r.getLong(0).toInt)).distinct.sorted
      }

      val kernPart = docsDf
        .filter(length(translate($"text", " ", "")) > 0)
        .select($"doc_id",
          hex(org.apache.spark.sql.graft.TokenSetHashes.of($"text")
            .getField("key")).as("k"))
        .collect().map(r => r.getLong(0) -> r.getString(1))
        .groupBy(_._2).values.map(_.map(_._1).toSet).toSet

      (hofPart == want) :| s"HOF set-key partition drifted: $hofPart != $want" &&
        hofToks :| "HOF toks diverged from reference sorted-distinct stream" &&
        (kernPart == want) :| s"kernel set-key partition drifted: $kernPart != $want"
    }
}
