package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{TokenSetHashes, WordGramHashes}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The fused native token kernels must be BIT-EQUAL to the HOF pipelines
  * they replace (same xxhash64 family, same pmod folds), on both the
  * interpreted and codegen evaluation paths. */
class TokenKernelsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "Hello  World hello"), // double space + case-fold duplicate
    (2L, "a b"),
    (3L, "   "), // tokenless
    (4L, "x y z w x y z"), // repeated tokens (gram stream keeps dups)
    (5L, ""),
    (6L, "solo")).toDF("id", "text")

  private def hofHarr = array_sort(array_distinct(transform(
    filter(split(lower($"text"), " "), w => w =!= ""),
    w => pmod(xxhash64(w), lit(1L << 40)))))

  test("TokenSetHashes.harr equals the HOF pmod(xxhash64, 2^40) pipeline bit-for-bit") {
    val got = docs.select($"id", TokenSetHashes.of($"text").getField("harr").as("h"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString)).toMap
    val want = docs.select($"id",
        when(size(hofHarr) > 0, hofHarr).as("h"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString)).toMap
    assert(got == want)
    assert(got(3L).isEmpty && got(5L).isEmpty) // tokenless → NULL struct
  }

  test("TokenSetHashes.key is set-identity: same token SET, same key; different set, different key") {
    val keys = Seq((1L, "b a"), (2L, "a  b b A"), (3L, "a c"))
      .toDF("id", "text")
      .select($"id", hex(TokenSetHashes.of($"text").getField("key")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keys(1L) == keys(2L)) // order/dup/case-insensitive set identity
    assert(keys(1L) != keys(3L))
  }

  test("WordGramHashes equals the HOF rolling-xxhash64 pipeline bit-for-bit") {
    val n = 2
    val th = transform(filter(split(lower($"text"), " "), w => w =!= ""),
      w => xxhash64(w))
    val hof = when(size(th) >= n,
        sort_array(array_distinct(transform(sequence(lit(1), size(th) - lit(n - 1)),
          i => pmod(xxhash64(element_at(th, i), element_at(th, i + 1)),
            lit(1L << 60))))))
      .otherwise(array().cast("array<bigint>"))
    val got = docs.select($"id", WordGramHashes.of($"text", n).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = docs.select($"id", hof.as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == want)
    assert(got(3L).isEmpty && got(6L).isEmpty) // < n tokens → EMPTY, not null
  }

  test("SimHash64 equals the aggregated xxhash64 vote circuit bit-for-bit") {
    val got = docs.select($"id",
        org.apache.spark.sql.graft.SimHash64.of($"text").as("s"))
      .filter($"s".isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // aggregated form: explode distinct tokens, 64 bit-vote sums, assemble
    val tok = docs.select($"id", explode(array_distinct(
        filter(split(lower($"text"), " "), w => w =!= ""))).as("w"))
      .withColumn("h", xxhash64($"w"))
    val bitVotes = (0 until 64).map { k =>
      sum(when($"h".bitwiseAND(lit(1L << k)) =!= 0L, 1).otherwise(-1)).as(s"b$k")
    }
    val assemble = (0 until 64).map { k =>
      when(col(s"b$k") > 0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val want = tok.groupBy($"id").agg(bitVotes.head, bitVotes.tail: _*)
      .select($"id", assemble.as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want && got.nonEmpty)
    assert(!got.contains(3L) && !got.contains(5L)) // tokenless docs absent
  }

  test("TokenTfPairs equals the HOF sorted-run-length tf pipeline value-for-value") {
    import org.apache.spark.sql.graft.TokenTfPairs
    // the HOF form tfidfTopK used before the kernel: sort the token
    // stream, find run starts, emit (token, run length) structs
    val toksSorted = array_sort(filter(split(lower($"text"), " "), w => w =!= ""))
    val starts = filter(sequence(lit(1), size($"__t")), i =>
      (i === 1) || (element_at($"__t", greatest(i - 1, lit(1))) =!=
        element_at($"__t", i)))
    val runs = transform(sequence(lit(1), size($"__s")), j => struct(
      element_at($"__t", element_at($"__s", j)).as("token"),
      (coalesce(try_element_at($"__s", j + 1), size($"__t") + 1) -
        element_at($"__s", j)).cast("long").as("tf")))
    val hof = docs
      .filter(length(translate($"text", " ", "")) > 0)
      .select($"id", toksSorted.as("__t"))
      .select($"id", $"__t", starts.as("__s"))
      .select($"id", explode(runs).as("__r"))
      .select($"id", $"__r.token", $"__r.tf")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val kern = docs
      .filter(length(translate($"text", " ", "")) > 0)
      .select($"id", explode(TokenTfPairs.of($"text")).as("__r"))
      .select($"id", $"__r.token", $"__r.tf")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(kern == hof && kern.nonEmpty)
    // null for tokenless
    val nulls = docs.select($"id", TokenTfPairs.of($"text").as("p"))
      .filter($"p".isNull).collect().map(_.getLong(0)).toSet
    assert(nulls == Set(3L, 5L))
  }

  test("DistinctTokens equals array_distinct(tokens) as a set, sorted") {
    import org.apache.spark.sql.graft.DistinctTokens
    val hof = docs.select($"id",
        array_distinct(filter(split(lower($"text"), " "), w => w =!= "")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).sorted.toSeq).toMap
    val kern = docs.select($"id", DistinctTokens.of($"text").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    kern.foreach { case (id, ts) =>
      assert(ts == hof(id), s"doc $id")
      assert(ts == ts.sorted, s"doc $id not sorted")
    }
    assert(kern(3L).isEmpty && kern(5L).isEmpty) // tokenless → EMPTY
  }

  test("registered as SQL functions via GraftExtensions (real injection path)") {
    import org.apache.spark.sql.SparkSession
    // build a session THROUGH the real extension wiring — a hand-registered
    // duplicate of the builders would keep passing even if injectFunction
    // itself regressed. The shared test context is reused (never stopped);
    // active/default session are cleared so getOrCreate constructs a fresh
    // SparkSession with the extension applied, and restored afterwards.
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      assert(s2 ne old, "expected a fresh session carrying the extension")
      val docs2 = {
        import scala.jdk.CollectionConverters._
        s2.createDataFrame(docs.collect().toList.asJava, docs.schema)
      }
      docs2.createOrReplaceTempView("tkspec")
      val sh = s2.sql(
        "SELECT simhash64(text) AS s FROM tkspec WHERE id = 4").head().getLong(0)
      val shDf = docs.filter($"id" === 4L)
        .select(org.apache.spark.sql.graft.SimHash64.of($"text")).head().getLong(0)
      assert(sh == shDf)
      val g = s2.sql(
        "SELECT size(word_gram_hashes(text, 2)) AS n FROM tkspec WHERE id = 2")
        .head().getInt(0)
      assert(g == 1) // "a b" has exactly one 2-gram
      val ts = s2.sql(
        "SELECT size(token_set_hashes(text).harr) AS n FROM tkspec WHERE id = 4")
        .head().getInt(0)
      assert(ts == 4) // x y z w
      val cs = s2.sql(
        "SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c").head().getDouble(0)
      assert(math.abs(cs - 1.0) < 1e-9)
      // builder validation: wrong arity and fractional n must fail the
      // ANALYSIS clearly, not throw IndexOutOfBounds / silently truncate
      def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
        .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
      val e1 = intercept[Throwable](s2.sql("SELECT word_gram_hashes(text) FROM tkspec").collect())
      assert(chain(e1).contains("2 arguments"), chain(e1))
      val e2 = intercept[Throwable](s2.sql("SELECT word_gram_hashes(text, 2.5) FROM tkspec").collect())
      assert(chain(e2).toUpperCase.contains("INTEGRAL"), chain(e2))
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("interpreted and codegen paths agree") {
    // direct Expression.eval (interpreted) vs the projected query (codegen)
    val viaCodegen = docs
      .select($"id", hex(TokenSetHashes.of($"text").getField("key")).as("k"),
        TokenSetHashes.of($"text").getField("harr").as("h"),
        WordGramHashes.of($"text", 3).as("g"))
      .collect().map(r => (r.getLong(0),
        (r.getString(1), r.getSeq[Long](2), r.getSeq[Long](3)))).toMap
    val text = org.apache.spark.unsafe.types.UTF8String.fromString("x y z w x y z")
    val interpTs = TokenSetHashes(
      org.apache.spark.sql.catalyst.expressions.Literal(text)).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val interpG = WordGramHashes(
      org.apache.spark.sql.catalyst.expressions.Literal(text), 3).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val (k4, h4, g4) = viaCodegen(4L)
    assert(interpTs.getBinary(0).map("%02X".format(_)).mkString == k4)
    assert(interpTs.getArray(1).toLongArray().toSeq == h4)
    assert(interpG.toLongArray().toSeq == g4)
  }
}
