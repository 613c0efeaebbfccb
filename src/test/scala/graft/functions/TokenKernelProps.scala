package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.graft.TokenKernels
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Fuzz pins for the hand-written byte-span tokenizer inside
  * [[TokenKernels]]: for ARBITRARY unicode input (multi-byte chars, astral
  * pairs, combining marks, runs of spaces) the kernels must agree with a
  * straightforward String-level reference — `split(lower(text), " ")`,
  * drop empties, xxhash64(seed 42) each token — exactly the semantics of
  * the HOF pipelines they replaced. The byte-scan is sound because 0x20
  * never occurs inside a UTF-8 multi-byte sequence; these properties are
  * the executable form of that argument. */
object TokenKernelProps extends Properties("TokenKernels") {

  // pieces include ASCII, multi-byte (é, ß, 中), an astral emoji (surrogate
  // pair), a combining mark, and explicit space runs
  private val pieces = Gen.oneOf(
    "a", "B", "z9", "é", "ß", "中文", "🎉", "é", " ", "  ", "")
  private val texts: Gen[String] =
    Gen.listOf(pieces).map(_.mkString)

  private def refTokenHashes(s: String): Array[Long] =
    UTF8String.fromString(s).toLowerCase.toString
      .split(" ", -1).filter(_.nonEmpty).map { w =>
        val b = UTF8String.fromString(w).getBytes
        XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      }

  private def sortedDistinct(a: Array[Long]): Seq[Long] = a.toSeq.distinct.sorted

  property("TokenSetHashes.harr = sorted distinct 2^40 folds of the reference") =
    forAll(texts) { s =>
      val got = TokenKernels.tokenSet(UTF8String.fromString(s))
      val ref = refTokenHashes(s)
      if (ref.isEmpty) got == null
      else {
        val want = sortedDistinct(ref.map(h => Math.floorMod(h, 1L << 40)))
        got != null && got.getArray(1).toLongArray().toSeq == want
      }
    }

  property("TokenSetHashes.key is a pure function of the token SET") =
    forAll(texts, texts) { (s1, s2) =>
      def key(s: String): Option[Seq[Byte]] =
        Option(TokenKernels.tokenSet(UTF8String.fromString(s)))
          .map(_.getBinary(0).toSeq)
      def set(s: String): Set[Long] = refTokenHashes(s).toSet
      val (k1, k2) = (key(s1), key(s2))
      if (set(s1) == set(s2)) k1 == k2
      else k1 != k2 // distinct sets: keys differ (SHA-256 over the hashes)
    }

  property("WordGramHashes = distinct rolling xxhash64-chain folds of the reference") =
    forAll(texts, Gen.choose(1, 4)) { (s, n) =>
      val got = TokenKernels.gramHashes(UTF8String.fromString(s), n)
        .toLongArray().toSeq
      val th = refTokenHashes(s)
      val want =
        if (th.length < n) Seq.empty[Long]
        else sortedDistinct(th.sliding(n).map(w =>
          Math.floorMod(w.foldLeft(42L)((acc, h) => XXH64.hashLong(h, acc)),
            1L << 60)).toArray)
      got == want
    }

  private def refTokens(s: String): Seq[String] =
    UTF8String.fromString(s).toLowerCase.toString.split(" ", -1).toSeq.filter(_.nonEmpty)

  property("tokenTfPairs = sorted (token, count) of the String-level reference") =
    forAll(texts) { s =>
      val got = TokenKernels.tokenTfPairs(UTF8String.fromString(s))
      val toks = refTokens(s)
      if (toks.isEmpty) got == null
      else {
        val want = toks.groupBy(identity).view.mapValues(_.size.toLong).toSeq
          .sortWith((a, b) =>
            UTF8String.fromString(a._1).compareTo(UTF8String.fromString(b._1)) < 0)
        got != null && (0 until got.numElements()).map { i =>
          val r = got.getStruct(i, 2)
          (r.getUTF8String(0).toString, r.getLong(1))
        } == want
      }
    }

  property("distinctTokens = sorted distinct tokens of the String-level reference") =
    forAll(texts) { s =>
      val got = TokenKernels.distinctTokens(UTF8String.fromString(s))
      val want = refTokens(s).distinct.map(UTF8String.fromString)
        .sortWith(_.compareTo(_) < 0)
      (0 until got.numElements()).map(i =>
        got.get(i, org.apache.spark.sql.types.StringType)
          .asInstanceOf[UTF8String]).toSeq == want
    }

  property("SimHash64 = the bit-vote circuit over distinct reference hashes") =
    forAll(texts) { s =>
      val got = TokenKernels.simHash64(UTF8String.fromString(s))
      val hs = refTokenHashes(s).distinct
      if (hs.isEmpty) got == null
      else {
        val want = (0 until 64).map { k =>
          val v = hs.map(h => if (((h >>> k) & 1L) == 1L) 1 else -1).sum
          if (v > 0) 1L << k else 0L
        }.reduce(_ | _)
        got != null && got.longValue() == want
      }
    }
}
