package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Product quantization: integer-exact training/encode/ADC machinery.
  * Cross-engine value correctness is the DuckDB oracle's job
  * (`ext_embedding_pq_codes` / `ext_embedding_pq_topk` replay training);
  * this spec pins the driver-side arithmetic against a plain-Scala
  * reference, determinism, the empty-bucket rule, and the clone-rank-1
  * ADC property. */
class PqSpec extends AnyFunSuite with SparkSpec {

  private def fp(x: Float): Long = math.floor(x * 65536d + 0.5d).toLong

  /** Plain-Scala reference: nearest codebook entry by exact squared L2,
    * ties to the lowest index. */
  private def refCode(sv: Array[Long], cents: Array[Array[Long]]): Int =
    cents.zipWithIndex.map { case (c, j) =>
      (c.zip(sv).map { case (a, b) => (a - b) * (a - b) }.sum, j)
    }.min._2

  private lazy val fixture =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("training is deterministic and index-shaped (m × k × dsub)") {
    val cb1 = Similarity.trainPqCodebooks(fixture, m = 4, k = 16, iters = 2)
    val cb2 = Similarity.trainPqCodebooks(fixture, m = 4, k = 16, iters = 2)
    assert(cb1.length == 4 && cb1.forall(_.length == 16) &&
      cb1.forall(_.forall(_.length == 16)))
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq == cb2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("codes match the plain-Scala argmin reference on the fixture corpus") {
    val cb = Similarity.trainPqCodebooks(fixture, m = 4, k = 16, iters = 2)
    val vecs = fixture.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val expected = vecs.flatMap { case (id, v) =>
      (0 until 4).map { s =>
        val sv = v.slice(s * 16, (s + 1) * 16).map(fp)
        (id, s, refCode(sv, cb(s)))
      }
    }.toSet
    val got = Similarity.pqCodes(fixture, cb)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == expected && got.forall(c => c._3 >= 0 && c._3 < 16))
  }

  test("ADC distances equal the code-then-lookup reference; clones rank first") {
    val sq = spark
    import sq.implicits._
    // 20 vectors in 8-d, m=2/k=4; vec 17 is an exact clone of vec 3
    val rows = (0L until 20L).map { i =>
      val v = Array.tabulate(8)(d => ((i * 7 + d * 3) % 11).toFloat / 11f - 0.4f)
      (i, v)
    }.map { case (i, v) => if (i == 17L) (i, {
      val c = Array.tabulate(8)(d => ((3L * 7 + d * 3) % 11).toFloat / 11f - 0.4f); c
    }) else (i, v) }
    val df = rows.toDF("vec_id", "embedding")
    val cb = Similarity.trainPqCodebooks(df, m = 2, k = 4, iters = 2)
    val out = Similarity.pqTopK(df, df.filter(col("vec_id") === 3), cb, k = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    // reference: dist(q, n) = Σ_s sqdist(fp_sub(q, s), cb(s)(code(n, s)))
    val byId = rows.toMap
    val q = byId(3L)
    def subFp(v: Array[Float], s: Int) = v.slice(s * 4, (s + 1) * 4).map(fp)
    val refDists = rows.filter(_._1 != 3L).map { case (id, v) =>
      id -> (0 until 2).map { s =>
        val code = refCode(subFp(v, s), cb(s))
        val c = cb(s)(code); val qs = subFp(q, s)
        c.zip(qs).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
    }.toMap
    out.foreach { case (nid, dist, _) => assert(dist == refDists(nid),
      s"ADC dist mismatch for $nid") }
    // an exact clone shares the query's codes, so its ADC distance is the
    // query's own quantization error Σ_s min_j d(q_s, c_j) — the MINIMUM
    // any candidate can achieve (rank-1 may still go to a lower id with
    // the same codes; the top distance must equal this floor)
    val minDist = (0 until 2).map { s =>
      val qs = subFp(q, s)
      cb(s).map(c => c.zip(qs).map { case (a, b) => (a - b) * (a - b) }.sum).min
    }.sum
    assert(refDists(17L) == minDist)
    assert(out.find(_._3 == 1).map(_._2).contains(minDist))
    // ranks are 1..5 by ascending distance
    assert(out.sortBy(_._3).map(_._2).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("ivfPqTopK with nprobe = all cells degrades exactly to pqTopK") {
    val cb = Similarity.trainPqCodebooks(fixture, m = 4, k = 16, iters = 2)
    val coarse = Similarity.trainPqCodebooks(fixture, m = 1, k = 8, iters = 2)(0)
    val queries = fixture.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val full = rows(Similarity.pqTopK(fixture, queries, cb, k = 5))
    val probed = rows(Similarity.ivfPqTopK(fixture, queries, coarse, cb,
      k = 5, nprobe = 8))
    assert(probed == full && full.nonEmpty)
  }

  test("ivfPqTopK probes prune: neighbors come only from probed cells, dists exact") {
    val cb = Similarity.trainPqCodebooks(fixture, m = 4, k = 16, iters = 2)
    val coarse = Similarity.trainPqCodebooks(fixture, m = 1, k = 8, iters = 2)(0)
    val vecs = fixture.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def fpv(v: Array[Float]) = v.map(fp)
    def cell(v: Array[Float]) = refCode(fpv(v), coarse)
    def probes(v: Array[Float], nprobe: Int) =
      coarse.zipWithIndex.map { case (c, j) =>
        (c.zip(fpv(v)).map { case (a, b) => (a - b) * (a - b) }.sum, j)
      }.sorted.take(nprobe).map(_._2).toSet
    val out = Similarity.ivfPqTopK(fixture, fixture.filter(col("vec_id") < 10),
        coarse, cb, k = 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (qid, nid, dist) =>
      assert(probes(vecs(qid), 1).contains(cell(vecs(nid))),
        s"neighbor $nid outside query $qid's probed cell")
      // dist parity with the plain-Scala ADC reference
      val q = vecs(qid); val n = vecs(nid)
      val expect = (0 until 4).map { s =>
        val qs = q.slice(s * 16, (s + 1) * 16).map(fp)
        val code = refCode(n.slice(s * 16, (s + 1) * 16).map(fp), cb(s))
        cb(s)(code).zip(qs).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
      assert(dist == expect, s"ADC dist mismatch for ($qid,$nid)")
    }
  }

  test("empty buckets keep their previous centroid (duplicate init vectors)") {
    val sq = spark
    import sq.implicits._
    // first 4 vectors init k=4; vec 0 and vec 3 are identical, so centroid
    // j=3 duplicates j=0 and loses every argmin tie to the lower index —
    // its bucket is empty in round 1 and the centroid must stay at its
    // init value (in a LATER round the twin's centroid moves off v0 and
    // j=3 can legitimately win vectors back — the rule under test is
    // empty-keeps-previous, so pin one round)
    val v0 = Array(0.5f, 0.5f, -0.5f, -0.5f)
    val df = Seq(
      0L -> v0, 1L -> Array(0.9f, -0.1f, 0.2f, 0.1f),
      2L -> Array(-0.7f, 0.3f, 0.6f, -0.2f), 3L -> v0,
      4L -> Array(0.51f, 0.49f, -0.52f, -0.48f),
      5L -> Array(0.88f, -0.12f, 0.22f, 0.08f)
    ).toDF("vec_id", "embedding")
    val cb = Similarity.trainPqCodebooks(df, m = 1, k = 4, iters = 1)
    assert(cb(0)(3).toSeq == v0.map(fp).toSeq)
    // the twin bucket absorbed vecs 0, 3, 4 — its centroid moved off init
    assert(cb(0)(0).toSeq != v0.map(fp).toSeq)
  }

  test("pqTopKRefine: dists are the EXACT full-dim fixed-point distances, " +
      "ranked ascending, drawn from the ADC shortlist") {
    val cb = Similarity.trainPqCodebooks(fixture, m = 4, k = 16, iters = 2)
    val queries = fixture.filter(col("vec_id") < 10)
    val vecs = fixture.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def exact(a: Array[Float], b: Array[Float]): Long =
      a.map(fp).zip(b.map(fp)).map { case (x, y) => (x - y) * (x - y) }.sum
    val shortlist = Similarity.pqTopK(fixture, queries, cb, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = Similarity.pqTopKRefine(fixture, queries, cb, k = 5, shortlist = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.map(_._1).toSet.size == 10 && out.length == 50)
    out.foreach { case (qid, nid, dist, _) =>
      // every refined pair came from the ADC shortlist…
      assert(shortlist.contains((qid, nid)), s"($qid,$nid) not shortlisted")
      // …and its dist is the exact full-dimension distance, not the ADC one
      assert(dist == exact(vecs(qid), vecs(nid)), s"dist not exact for ($qid,$nid)")
    }
    // within each query, ranks order by exact distance (ties by id)
    out.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(r => (r._3, r._2)).sliding(2)
        .forall(p => p.length < 2 || implicitly[Ordering[(Long, Long)]].lteq(p(0), p(1))))
    }
    // a shortlist covering the whole corpus makes the refine EXACT search:
    // rank-1 must be the true fixed-point nearest neighbor
    val n = fixture.count().toInt
    val full = Similarity.pqTopKRefine(fixture,
        fixture.filter(col("vec_id") === 3), cb, k = 1, shortlist = n)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    val best = vecs.filter(_._1 != 3L)
      .map { case (id, v) => (exact(vecs(3L), v), id) }.min
    assert(full == (best._2, best._1))
  }
}
