package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** X4 text statistics on crafted documents with hand-computed expectations. */
class TextAnalysisSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the cat sat on the mat"),
      (2L, "query scan filter query"),
      (3L, "data row column"),
    ).toDF("doc_id", "text")
  }

  test("global token counts (explode + groupBy)") {
    val counts = TextAnalysis.tokenCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("the") == 2L && counts("query") == 2L && counts("cat") == 1L)
  }

  test("whitespace token count per doc handles runs of spaces") {
    import spark.implicits._
    val d = Seq((9L, "a  b   c")).toDF("doc_id", "text")
    assert(TextAnalysis.tokenCountPerDoc(d, "doc_id", "text")
      .head().getInt(1) == 3)
  }

  test("bpe-ish count: letter runs, digit runs, punctuation singles") {
    import spark.implicits._
    val d = Seq((9L, "ab12 cd, e!")).toDF("doc_id", "text")
    // tokens: ab | 12 | cd | , | e | !  → 6
    assert(TextAnalysis.bpeishTokenCount(d, "doc_id", "text").head().getInt(1) == 6)
  }

  test("wordOccurrences counts whole tokens only") {
    import spark.implicits._
    val d = Seq(Tuple1("the theater loathe the")).toDF("text")
    // "the" appears as a whole token twice; 'theater'/'loathe' must not count
    assert(d.select(TextAnalysis.wordOccurrences(col("text"), "the"))
      .head().getLong(0) == 2L)
  }

  test("langId argmax with fixed tie-break") {
    val langs = TextAnalysis.langId(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(1L) == "en")
    assert(langs(2L) == "query-ish")
    assert(langs(3L) == "data-ish")
  }

  test("qualityScore ratios on a fully hand-checked doc") {
    import spark.implicits._
    val d = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(d, "doc_id", "text").head()
    assert(r.getInt(1) == 11)            // chars
    assert(r.getInt(2) == 3)             // tokens
    assert(r.getDouble(3) == 9.0 / 11.0) // alpha ratio (9 letters, 2 spaces)
    assert(r.getDouble(4) == 1.0 / 3.0)  // stopwords: "the" once, "a" zero
    assert(r.getDouble(5) == 3.0)        // mean token len (11-3+1)/3
  }

  test("normalize: lowercase, strip punctuation, collapse whitespace") {
    import spark.implicits._
    val d = Seq(Tuple1("  Hello,  WORLD!  it's 42. ")).toDF("text")
    assert(d.select(TextAnalysis.normalize(col("text"))).head().getString(0)
      == "hello world its 42")
  }

  test("maskPii redacts emails and long digit runs, leaves short numbers") {
    import spark.implicits._
    val d = Seq(Tuple1("mail a.b+c@x-corp.io or 5551234567, room 42")).toDF("text")
    assert(d.select(TextAnalysis.maskPii(col("text"))).head().getString(0)
      == "mail <EMAIL> or <NUM>, room 42")
  }

  test("fingerprint is order-sensitive and deterministic") {
    import spark.implicits._
    val d = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(3L)) // same order → same hash
    assert(fp(1L) != fp(2L)) // permutation → different hash (unlike minhash)
  }

  test("fingerprintMd5 twin: order-sensitive, bounded by the modulus, 0 for no tokens") {
    import spark.implicits._
    val d = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "  "))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprintMd5(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) != fp(2L))
    assert(fp(3L) == 0L) // token-less doc folds nothing — matches the oracle
    assert(fp.values.forall(v => v >= 0L && v < TextAnalysis.FingerprintMod))
  }

  test("ngramRepetition: repeated phrases raise dup_ratio; short docs are 0") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c a b c a b c"),      // 7 grams, 3 distinct -> 4/7 dup
      (2L, "one two three four"),     // 2 grams, all distinct -> 0.0
      (3L, "x y"),                    // under 3 tokens -> no grams, 0.0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramRepetition(d, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((7, 3, 4.0 / 7.0)))
    assert(out(2L) == ((2, 2, 0.0)))
    assert(out(3L) == ((0, 0, 0.0)))
  }

  test("chunkTokens: ragged tail, order preserved, token-less docs dropped") {
    import spark.implicits._
    val d = Seq((1L, "t1 t2 t3 t4 t5"), (2L, "only"), (3L, "   "))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(d, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(out.filter(_._1 == 1L).sortBy(_._2).toSeq == Seq(
      (1L, 0, "t1 t2", 2), (1L, 1, "t3 t4", 2), (1L, 2, "t5", 1)))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, "only", 1)))
    assert(!out.exists(_._1 == 3L))
  }

  test("tfidfTopK ranks by integer tf/df score with term tie-break, capped at k") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana common common"),
      (3L, "common")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(5)))
      .groupBy(_._1).map { case (d, rs) => d -> rs.sortBy(_._3).map(_._2).toSeq }
    // doc1: apple tf=2 df=1 dominates; banana (1/2) beats common (1/3)
    assert(out(1L) == Seq("apple", "banana"))
    // doc2: common tf=2 df=3 (~0.67) beats banana tf=1 df=2 (0.5)
    assert(out(2L) == Seq("common", "banana"))
    assert(out(3L) == Seq("common"))
  }

  test("stripMarkup: comments (multi-line), tags, entities, collapse — in order") {
    import spark.implicits._
    val doc = "<div class=\"x\"><p>Hello  <b>world</b></p>" +
      "<!-- multi\nline comment --> &amp; friends&nbsp;&#39;q&#39; &lt;tag&gt;</div>"
    val out = Seq(doc).toDF("t")
      .select(TextAnalysis.stripMarkup(col("t")).as("c"))
      .collect()(0).getString(0)
    // entities decode AFTER tag strip: &lt;tag&gt; stays literal text
    assert(out == "Hello world & friends 'q' <tag>")
  }

  test("invertedIndex: df counts distinct docs, postings are the first k ascending ids") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "b x")).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, "doc_id", "text", k = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // "a" repeats in doc 1 but counts once (distinct pairs); "b" df=3 with
    // postings TRUNCATED to the first 2 ascending ids
    assert(out == Map(
      "a" -> ((1L, "1")), "b" -> ((3L, "1,2")), "c" -> ((1L, "2")),
      "x" -> ((1L, "3"))))
  }

  test("cooccurrence: pairs within the window, canonical order, support gate") {
    import spark.implicits._
    val docs = Seq("b a c a", "c b").toDF("text")
    // window 2 pairs per doc: "b a c a" -> (a,b),(b,c),(a,c),(a,c),(a,a)
    //                         "c b"     -> (b,c)
    val out = TextAnalysis.cooccurrence(docs, "text", window = 2, minSupport = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("a", "b") -> 1L, ("b", "c") -> 2L, ("a", "c") -> 2L, ("a", "a") -> 1L))
    // support gate: only pairs seen >= 2 times survive
    val gated = TextAnalysis.cooccurrence(docs, "text", window = 2, minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(gated == Set(("b", "c"), ("a", "c")))
    // a window-1 run sees only adjacent pairs
    val adj = TextAnalysis.cooccurrence(docs, "text", window = 1, minSupport = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(adj == Map(("a", "b") -> 1L, ("a", "c") -> 2L, ("b", "c") -> 1L))
  }
}
