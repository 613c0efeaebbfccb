package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** X1/X2 dedup semantics on a crafted corpus with known duplicate structure. */
class DedupSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox"),
      (2L, "  The Quick Brown Fox "),         // exact dup of 1 after normalize
      (3L, "the quick brown fox jumps"),      // near-dup of 1
      (4L, "completely different words entirely unrelated"),
      (5L, "the quick brown fox"),            // exact dup of 1
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups normalized content, keeps min id (X1)") {
    val groups = Dedup.exact(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(groups.contains((1L, 3L))) // docs 1,2,5 collapse; keep 1
    assert(Dedup.dropExactDups(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L))
  }

  test("minhash LSH finds identical-token-set docs as candidates (X2)") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", seeds = 16, rowsPerBand = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1, 2, 5 have the same token SET → identical signatures → all bands match
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 5L)) && pairs.contains((2L, 5L)))
    // doc 4 shares no tokens → must never pair
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("jaccard verification on candidates (X2 step 2)") {
    val cands = Dedup.minhashPairs(docs, "doc_id", "text", 16, 8)
    val verified = Dedup.jaccardOnCandidates(docs, "doc_id", "text", cands, 0.99)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2)))
    verified.foreach { case (_, _, j) => assert(j >= 0.99 && j <= 1.0) }
    // identical sets → jaccard exactly 1.0
    assert(verified.forall(_._3 == 1.0))
  }

  test("nearDupsFused matches the unfused candidates→jaccard pipeline") {
    val fused = Dedup.nearDupsFused(docs, "doc_id", "text", 16, 8, 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    val unfused = Dedup.jaccardOnCandidates(docs, "doc_id", "text",
      Dedup.minhashPairs(docs, "doc_id", "text", 16, 8), 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    assert(fused == unfused && fused.nonEmpty)
  }

  test("dropNearDups keeps the lowest-id representative of each near-dup set") {
    val kept = Dedup.dropNearDups(docs, "doc_id", "text", 16, 8, 0.99)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 1,2,5 are identical-token-set near-dups → keep 1 only; 3 and 4 survive
    assert(kept == Set(1L, 3L, 4L))
  }

  test("dropNearDups retains token-less docs (empty / whitespace-only / NULL text)") {
    import spark.implicits._
    val withEmpty = docs.unionByName(
      Seq((6L, ""), (7L, "   "), (8L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val kept = Dedup.dropNearDups(withEmpty, "doc_id", "text", 16, 8, 0.99)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 6, 7, 8 tokenize to nothing: not near-dups of anything → retained
    assert(kept == Set(1L, 3L, 4L, 6L, 7L, 8L))
    val keptCC = Dedup.dropNearDupsCC(withEmpty, "doc_id", "text", 16, 8, 0.99)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptCC == Set(1L, 3L, 4L, 6L, 7L, 8L))
  }

  test("dropNearDupsAgainst: drops only incoming near-dups of the reference") {
    import spark.implicits._
    val reference = Seq(
      (100L, "the quick brown fox"),
      (101L, "shared reference boilerplate sentence")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "fox brown quick the"),       // same token SET as ref 100 → dropped
      (2L, "the quick brown fox"),       // verbatim ref clone → dropped
      (3L, "completely unrelated words entirely"), // kept
      (4L, "completely unrelated words entirely"), // internal dup of 3 — NOT this op's job, kept
      (5L, ""),                          // token-less → kept
      (6L, null.asInstanceOf[String])    // NULL text → kept
    ).toDF("doc_id", "text")
    val kept = Dedup.dropNearDupsAgainst(reference, incoming, "doc_id", "text", 16, 8, 0.95)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L, 5L, 6L))
    // empty reference: everything survives
    val keptAll = Dedup.dropNearDupsAgainst(
        reference.filter(col("doc_id") < 0), incoming, "doc_id", "text", 16, 8, 0.95)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptAll == Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("dropNearDupsAgainst equals the symmetric machinery restricted to cross pairs") {
    // parity on the fixture corpus: an incoming doc is dropped iff the
    // SYMMETRIC verified pipeline (nearDupsFused over the whole corpus)
    // finds a verified pair linking it to a reference doc — the asymmetric
    // banding (doc-level incoming × set-collapsed reference) must induce
    // exactly the same candidate predicate
    val all = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val ref = all.filter(col("doc_id") % 13 === 0)
    val inc = all.filter(col("doc_id") % 13 =!= 0)
    val crossDropped = Dedup.nearDupsFused(all, "doc_id", "text", 16, 8, 0.95)
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .flatMap { case (a, b) =>
        (a % 13, b % 13) match {
          case (0, x) if x != 0 => Some(b)
          case (x, 0) if x != 0 => Some(a)
          case _ => None
        }
      }.toSet
    assert(crossDropped.nonEmpty, "fixture must contain cross-corpus near-dups")
    val kept = Dedup.dropNearDupsAgainst(ref, inc, "doc_id", "text", 16, 8, 0.95)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val incIds = inc.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == incIds -- crossDropped)
  }

  test("dropNearDupsAgainstFast (kernel) is index-equivalent to the md5 witness") {
    // same contract as minhashPairsFast-vs-witness: the two 40-bit hash
    // families are equivalent LSH indexes, not bit-identical ones — clone
    // (identical-set) drops are deterministic under BOTH, marginal
    // (0.95 <= j < 1) candidates are independent draws per family
    import spark.implicits._
    val reference = Seq(
      (100L, "the quick brown fox"),
      (101L, "zebra yak xylophone wombat")).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "fox brown THE quick"),                    // ref-100 clone set → drops
      (2L, "completely different words entirely"),    // kept
      (3L, "zebra wombat xylophone yak")              // ref-101 clone set → drops
    ).toDF("doc_id", "text")
    def kept(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    // clone-only corpus: exact equality is deterministic for any family
    assert(kept(Dedup.dropNearDupsAgainst(reference, incoming, "doc_id", "text")) == Set(2L))
    assert(kept(Dedup.dropNearDupsAgainstFast(reference, incoming, "doc_id", "text")) == Set(2L))

    // fixture corpus: dropped-set agreement pinned at the IoU floor the
    // symmetric fast-vs-witness spec derives (~0.89 recall per family at
    // j=0.95 → ≥0.80 IoU for ideal independent families)
    val all = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val ref = all.filter(col("doc_id") % 13 === 0)
    val inc = all.filter(col("doc_id") % 13 =!= 0)
    val incIds = inc.select("doc_id").collect().map(_.getLong(0)).toSet
    val dw = incIds -- kept(Dedup.dropNearDupsAgainst(ref, inc, "doc_id", "text", 16, 8, 0.95))
    val df = incIds -- kept(Dedup.dropNearDupsAgainstFast(ref, inc, "doc_id", "text", 16, 8, 0.95))
    assert(dw.nonEmpty && df.nonEmpty, "fixture must contain cross-corpus drops")
    val iou = (dw & df).size.toDouble / (dw | df).size.toDouble
    assert(iou >= 0.80, f"dropped-set IoU $iou%.3f fell below the pinned floor")
  }

  test("fuzzyNearDups finds small-edit-distance pairs, never crosses maxDist") {
    import spark.implicits._
    val rows = Seq(
      (1L, "the quick brown fox jumps over the dog"),
      (2L, "the quick brown fix jumps over the dog"), // 1 substitution from 1
      (3L, "the quick brown fox jumps over the dig"), // 1 substitution from 1
      (4L, "completely unrelated text about ducks here"),
      (5L, "ab"), // shorter than q=4: no grams, excluded
      (6L, "the quick brown fox jumps over the dog"), // exact clone of 1
    ).toDF("doc_id", "snippet")
    val out = Dedup.fuzzyNearDups(rows, "doc_id", "snippet", maxDist = 3, q = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out((1L, 2L)) == 1 && out((1L, 3L)) == 1 && out((2L, 3L)) == 2)
    // rep-collapse expansion: the clone pairs with its rep at dist 0 and
    // inherits the rep's verified distances exactly
    assert(out((1L, 6L)) == 0 && out((2L, 6L)) == 1 && out((3L, 6L)) == 1)
    assert(out.keys.forall { case (a, b) => a < b && a != 4L && b != 4L && b != 5L },
      s"unrelated/short strings must never pair: $out")
    // the cache-lifecycle contract extends to the fuzzy pipeline
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("minhashPairsFast (xxhash64) is bucket-structure-equivalent to the md5 witness") {
    // The two 40-bit token-hash families index the SAME pipeline; they are
    // equivalent LSH indexes, not bit-identical ones — each family's band
    // recall on a jaccard-j pair is the same 1-(1-j^r)^b curve, but the
    // marginal (0.95 <= j < 1) pairs each catches are independent draws.
    // What IS deterministic, and what this pins:
    //  (1) identical-token-set pairs are caught by BOTH with probability 1
    //      (rep-collapse: same set -> same rep -> expanded pair, no hashing
    //      involved) — checked exhaustively on the fixture corpus;
    //  (2) on a corpus whose only near-dups are identical-set clones the
    //      pair sets are exactly equal (clones pair with probability 1,
    //      disjoint sets with probability ~0 under ANY 40-bit family);
    //  (3) fixture agreement stays high — verified-pair-set IoU pinned at
    //      its measured value (0.86; both families, 2 bands x 8 rows,
    //      individually have ~0.89 expected recall at j=0.95, so ~0.80 IoU
    //      is the theoretical floor for ideal hash families).
    val cloneOnly = {
      import spark.implicits._
      Seq(
        (1L, "the quick brown fox"),
        (2L, "  The Quick Brown Fox "),              // same token set as 1
        (3L, "completely different words entirely unrelated"),
        (4L, "the quick brown fox"),                 // same token set as 1
        (5L, "zebra yak xylophone wombat")           // disjoint from all
      ).toDF("doc_id", "text")
    }
    val md5Crafted = Dedup.minhashPairs(cloneOnly, "doc_id", "text", 16, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fastCrafted = Dedup.minhashPairsFast(cloneOnly, "doc_id", "text", 16, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fastCrafted == md5Crafted && fastCrafted == Set((1L, 2L), (1L, 4L), (2L, 4L)))

    val fix = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // exhaustive identical-set clone pairs (pure set arithmetic, no LSH)
    val setsOf = Dedup.tokenSets(fix, "doc_id", "text")
      .select(col("doc_id"), col("__set_key"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val clonePairs = setsOf.groupBy(_._2).values.filter(_.length > 1)
      .flatMap(g => g.map(_._1).sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
    val md5Fix = Dedup.minhashPairs(fix, "doc_id", "text", 16, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fastFix = Dedup.minhashPairsFast(fix, "doc_id", "text", 16, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clonePairs.nonEmpty && clonePairs.subsetOf(md5Fix) && clonePairs.subsetOf(fastFix),
      s"clone pairs must be caught by both families (missed by md5: " +
        s"${(clonePairs -- md5Fix).size}, by fast: ${(clonePairs -- fastFix).size})")
    def verified(c: Set[(Long, Long)]) = {
      import spark.implicits._
      Dedup.jaccardOnCandidates(fix, "doc_id", "text",
        c.toSeq.toDF("doc_a", "doc_b"), 0.95)
        .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    }
    val (vm, vf) = (verified(md5Fix), verified(fastFix))
    val iou = (vm & vf).size.toDouble / (vm | vf).size.toDouble
    assert(iou >= 0.80, f"verified-pair IoU $iou%.3f fell below the pinned floor")
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("dedup pipelines leave no persisted tables behind (cache lifecycle contract)") {
    // the round-5 regression: internal persists leaked until
    // spark.catalog.clearCache(), charging cache fill + GC to every caller.
    // Contract now: once a drop* result materializes, the session cache is
    // empty — internal intermediates are checkpointed and freed, and the
    // only surviving block is the narrow kept-id checkpoint.
    spark.catalog.clearCache()
    Dedup.dropNearDupsCC(docs, "doc_id", "text", 16, 8, 0.95).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "dropNearDupsCC must not leave persisted tables in the cache manager")
    Dedup.dropNearDups(docs, "doc_id", "text", 16, 8, 0.95).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "dropNearDups must not leave persisted tables in the cache manager")
    Dedup.nearDupsFused(docs, "doc_id", "text", 16, 8, 0.5).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "nearDupsFused must not leave persisted tables in the cache manager")
  }

  test("fused bands emit a trailing partial band (seeds not divisible by rowsPerBand)") {
    // seeds=10, rowsPerBand=4 → bands of 4,4,2; the fused wide-agg path must
    // produce the same candidate pairs as the unfused signatures→bands path
    val fusedPairs = Dedup.minhashPairs(docs, "doc_id", "text", seeds = 10, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bands = Dedup.minhashBands(
      Dedup.minhashSignatures(docs, "doc_id", "text", seeds = 10), "doc_id", rowsPerBand = 4)
    val a = bands.select(col("doc_id").as("doc_a"), col("band"), col("band_sig"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band"), col("band_sig"))
    val unfusedPairs = a.join(b, Seq("band", "band_sig"))
      .filter(col("doc_a") < col("doc_b")).select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fusedPairs == unfusedPairs && fusedPairs.nonEmpty)
  }

  test("simhash: identical docs collide, disjoint docs differ; deterministic") {
    val h = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(5L)) // same tokens → same simhash
    assert(h(1L) != h(4L)) // disjoint vocab → different
    val h2 = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == h2) // run-over-run deterministic (fixed hash, no RNG)
  }

  test("connectedComponents: min-label propagation across chains, singletons stay") {
    import spark.implicits._
    // two components: {1,2,3} (a chain — 1 and 3 not directly joined) and {10,11}
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    // local union-find path (small graph, default threshold)...
    val local = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == expected)
    // ...and the distributed hash-min loop, forced via localThreshold = 0
    val dist = Dedup.connectedComponents(edges, localThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == expected)
  }

  test("star CC equals hash-min CC on seeded random graphs, and on a long path") {
    import spark.implicits._
    def labelsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a 40-node path — diameter 39, the hash-min worst case (still < maxIter)
    val path = (0L until 39L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val starPath = labelsOf(Dedup.connectedComponentsStar(path))
    assert(starPath.size == 40 && starPath.values.forall(_ == 0L))
    // distributed hash-min walks the full 39-round diameter
    val hmPath = labelsOf(Dedup.connectedComponents(path, maxIter = 45, localThreshold = 0))
    assert(hmPath.size == 40 && hmPath.values.forall(_ == 0L))
    // seeded random graphs: same components from both algorithms
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val es = Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter { case (a, b) => a != b }
      val edges = es.toDF("doc_a", "doc_b")
      val hm = labelsOf(Dedup.connectedComponents(edges, localThreshold = 0))
      val lo = labelsOf(Dedup.connectedComponents(edges))
      val st = labelsOf(Dedup.connectedComponentsStar(edges))
      assert(st == hm, s"seed=$seed: star=$st hashmin=$hm")
      assert(lo == hm, s"seed=$seed: local=$lo hashmin=$hm")
    }
  }

  test("dropNearDupsCC collapses transitive near-dups that keep-lowest retains") {
    import spark.implicits._
    // c = 40 tokens; a and b each swap ONE different token of c:
    // jaccard(a,c) = jaccard(b,c) = 39/41 ≈ 0.951, jaccard(a,b) = 38/42 ≈ 0.905
    val base = (1 to 40).map(i => s"tok$i")
    val cT = base.mkString(" ")
    val aT = ("uniqA" +: base.tail).mkString(" ")
    val bT = (base.init :+ "uniqB").mkString(" ")
    val docs = Seq((1L, aT), (2L, bT), (3L, cT)).toDF("doc_id", "text")
    // rowsPerBand=1: every seed its own band — maximal LSH recall so the
    // candidate set surely contains all three pairs; threshold picks edges
    val keepLowest = Dedup.dropNearDups(docs, "doc_id", "text", 16, 1, 0.93)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val cc = Dedup.dropNearDupsCC(docs, "doc_id", "text", 16, 1, 0.93)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keepLowest == Set(1L, 2L)) // 3 dominated by both; 1,2 not adjacent
    assert(cc == Set(1L))             // one survivor per connected component
  }

  test("drop paths survive a ~1M-member clone group without wide member rows") {
    import spark.implicits._
    // A boilerplate corpus's worst case: ONE million exact clones. The old
    // collect_list shape materialized the whole clone group as a single
    // array row (multi-GB at web scale → executor OOM); the drop paths now
    // decide clone drops from the scalar-width doc→rep window map, so the
    // group costs only its row count. Also in the corpus: a near-dup pair
    // (jaccard 39/41 ≈ 0.951) exercising the dominated-rep side.
    val n = 1000000L
    val mega = spark.range(n).select(col("id").as("doc_id"),
      lit("standard boilerplate disclaimer appended to every document").as("text"))
    val base = (1 to 40).map(i => s"w$i")
    val docs = mega.unionByName(Seq(
      (n + 1, base.mkString(" ")),
      (n + 2, (base.init :+ "wX").mkString(" "))).toDF("doc_id", "text"))
    // rowsPerBand=1 → 16 one-seed bands: max LSH recall, deterministic
    val kept = Dedup.dropNearDups(docs, "doc_id", "text", 16, 1, 0.95)
    // plan-level guarantee: no member-collecting aggregate anywhere in the
    // lazy drop pipeline
    assert(!kept.queryExecution.optimizedPlan.toString.contains("collect_list"),
      "dropNearDups must not build member arrays")
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(0L, n + 1))
    assert(Dedup.dropNearDupsCC(docs, "doc_id", "text", 16, 1, 0.95)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(0L, n + 1))
  }

  test("simhashMd5 twin: same collision behavior, hash fits the bit width") {
    val h = Dedup.simhashMd5(docs, "doc_id", "text", bits = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(5L)) // same tokens → same simhash
    assert(h(1L) != h(4L)) // disjoint vocab → different
    assert(h.values.forall(v => v >= 0L && v < (1L << 16)))
  }

  test("hamming distance: 0 for equal, counts differing bits") {
    import spark.implicits._
    val pairs = Seq((5L, 5L), (0L, 7L)).toDF("a", "b")
    val d = pairs.select(Dedup.hamming(col("a"), col("b"))).collect().map(_.getInt(0))
    assert(d.toSeq == Seq(0, 3))
  }

  test("tokens: lowercased, de-duped per doc, empties dropped") {
    import spark.implicits._
    val t = Dedup.tokens(Seq((9L, "A  a b")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(_.getString(1)).sorted.toSeq
    assert(t == Seq("a", "b"))
  }

  test("minhashEstimates: same pair set as minhashPairs; agreement matches " +
      "an independent per-seed recount; exact clones estimate 1.0") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val est = Dedup.minhashEstimates(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(est.nonEmpty)
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 16).collect()
      .groupBy(_.getLong(0)).map { case (id, rows) =>
        id -> rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    est.foreach { case (a, b, n, e) =>
      val agree = sig(a).zip(sig(b)).count { case (x, y) => x == y }
      assert(n == agree, s"($a,$b) n_agree $n != recount $agree")
      assert(e == agree / 16.0)
    }
    val pairSet = Dedup.minhashPairs(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(est.map(p => (p._1, p._2)).toSet == pairSet)
    // identical token sets agree on every seed (same-set pairs ride the
    // rep collapse, not the band join — the estimator must still cover them)
    val clones = est.filter { case (a, b, _, _) => sig(a) == sig(b) }
    assert(clones.nonEmpty && clones.forall(c => c._3 == 16 && c._4 == 1.0))
  }

  test("containmentPairs: bounds, same pair set, jaccard reconstructs, clones at 1.0") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getDouble(4)))
    assert(cont.nonEmpty)
    // containment is a fraction of a real overlap: (0, 1] on both sides
    cont.foreach { case (a, b, i, ca, cb) =>
      assert(i > 0 && ca > 0 && cb > 0 && ca <= 1.0 && cb <= 1.0,
        s"($a,$b) overlap=$i cont=($ca,$cb)")
    }
    // exactly the candidate pair universe (no size-ratio prefilter)
    val pairSet = Dedup.minhashPairs(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cont.map(p => (p._1, p._2)).toSet == pairSet)
    // set sizes recover from the containments (na = i/ca), and the
    // verified jaccard of nearDupsFused must equal i/(na+nb-i) on the
    // pairs both surfaces emit — one algebraic identity across operators
    val jac = Dedup.nearDupsFused(docs, "doc_id", "text").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    var checked = 0
    cont.foreach { case (a, b, i, ca, cb) =>
      jac.get((a, b)).foreach { j =>
        val (na, nb) = (math.round(i / ca), math.round(i / cb))
        val expect = i.toDouble / (na + nb - i).toDouble
        assert(math.abs(j - expect) < 1e-12, s"($a,$b): $j vs $expect")
        checked += 1
      }
    }
    assert(checked > 0)
    // exact clones: total containment on both sides
    val ones = cont.filter(c => c._4 == 1.0 && c._5 == 1.0)
    assert(ones.nonEmpty && ones.forall(c => jac.get((c._1, c._2)).contains(1.0)))
  }

  test("jaccardJoinExact equals brute-force all-pairs jaccard (no missed, " +
      "no spurious pair) and its counts are the true set sizes") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e"), (2L, "e d c b a"),       // same set, J = 1
      (3L, "a b c d f"),                          // J(1,3) = 4/6 < 0.8
      (4L, "a b c d e f"),                        // J(1,4) = 5/6 ≥ 0.8
      (5L, "x y z"), (6L, "z y x"),               // same set, J = 1
      (7L, "q r")                                 // alone
    ).toDF("doc_id", "text")
    val got = Dedup.jaccardJoinExact(corpus, "doc_id", "text", 4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // brute force over the same token sets
    val sets = corpus.collect().map(r => r.getLong(0) ->
      r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty).toSet).toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      union = (sets(a) | sets(b)).size
      if 5 * inter >= 4 * union
    } yield (a, b) -> ((inter.toLong, sets(a).size.toLong, sets(b).size.toLong))).toMap
    assert(got == want)
    assert(got.keySet == Set((1L, 2L), (1L, 4L), (2L, 4L), (3L, 4L), (5L, 6L)))
  }

  test("jaccardJoinExact at theta=1 returns exactly the same-set pairs") {
    val got = Dedup.jaccardJoinExact(docs, "doc_id", "text", 1, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1, 2, 5 share one token set; 3 and 4 pair with nobody at J = 1
    assert(got == Set((1L, 2L), (1L, 5L), (2L, 5L)))
  }

  test("jaccardJoinExact equals brute force on seeded random corpora " +
      "(small vocab forces heavy overlap, duplicates force clone groups)") {
    import spark.implicits._
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
      val corpus = (1L to 60L).map { id =>
        if (rnd.nextInt(4) == 0 && id > 1)
          // duplicate an earlier doc's text → clone groups
          (id, null.asInstanceOf[String])
        else (id, Seq.fill(2 + rnd.nextInt(6))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val texts = scala.collection.mutable.Map[Long, String]()
      val resolved = corpus.map { case (id, t) =>
        val text = if (t != null) t else texts(1L + rnd.nextInt((id - 1).toInt))
        texts(id) = text
        (id, text)
      }
      val df = resolved.toDF("doc_id", "text")
      val got = Dedup.jaccardJoinExact(df, "doc_id", "text", 7, 10,
          bitmap = Some(false)) // pin the prefix-filter twin (at-scale path)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val sets = resolved.map { case (id, t) =>
        id -> t.toLowerCase.split(" ").filter(_.nonEmpty).toSet
      }.toMap
      val want = (for {
        a <- sets.keys; b <- sets.keys
        if a < b && sets(a).nonEmpty && sets(b).nonEmpty
        inter = (sets(a) & sets(b)).size; union = (sets(a) | sets(b)).size
        if 10 * inter >= 7 * union
      } yield (a, b)).toSet
      assert(got == want, s"seed $seed: ${got.diff(want).size} spurious, " +
        s"${want.diff(got).size} missed of ${want.size}")
    }
  }

  test("containmentJoinExact equals brute-force all-ORDERED-pairs " +
      "containment (no missed, no spurious) on a hand corpus") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e"), (2L, "e d c b a"),       // same set → c = 1 both ways
      (3L, "a b c"),                              // fully inside 1/2/4
      (4L, "a b c d e f g"),                      // superset of 1/2/3
      (5L, "x y z"), (6L, "z y x w"),             // 5 in 6 (3/3), not 6 in 5
      (7L, "q r")                                 // alone
    ).toDF("doc_id", "text")
    val got = Dedup.containmentJoinExact(corpus, "doc_id", "text", 9, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val sets = corpus.collect().map(r => r.getLong(0) ->
      r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty).toSet).toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a != b
      inter = (sets(a) & sets(b)).size
      if 10 * inter >= 9 * sets(a).size
    } yield (a, b) -> ((inter.toLong, sets(a).size.toLong, sets(b).size.toLong))).toMap
    assert(got == want)
    // the asymmetry is real: 5 ⊆ 6 qualifies, 6 ⊆ 5 does not
    assert(got.contains((5L, 6L)) && !got.contains((6L, 5L)))
    // clone family surfaces both orientations
    assert(got.contains((1L, 2L)) && got.contains((2L, 1L)))
  }

  test("containmentJoinExact equals brute force on seeded random corpora") {
    import spark.implicits._
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
      val resolved = (1L to 60L).map { id =>
        (id, Seq.fill(2 + rnd.nextInt(6))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = resolved.toDF("doc_id", "text")
      val got = Dedup.containmentJoinExact(df, "doc_id", "text", 4, 5,
          bitmap = Some(false)) // pin the prefix-filter twin
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val sets = resolved.map { case (id, t) =>
        id -> t.toLowerCase.split(" ").filter(_.nonEmpty).toSet
      }.toMap
      val want = (for {
        a <- sets.keys; b <- sets.keys if a != b
        inter = (sets(a) & sets(b)).size
        if 5 * inter >= 4 * sets(a).size
      } yield (a, b)).toSet
      assert(got == want, s"seed $seed: ${got.diff(want).size} spurious, " +
        s"${want.diff(got).size} missed of ${want.size}")
    }
  }

  test("containmentDropAgainst equals brute-force cross-corpus " +
      "containment drop on seeded random corpora") {
    import spark.implicits._
    for (seed <- Seq(5, 17)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
      val mk = (n: Int) => (1L to n.toLong).map { id =>
        (id, Seq.fill(2 + rnd.nextInt(6))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val inc = mk(40); val ref = mk(25).map { case (i, t) => (i + 1000L, t) }
      val got = Dedup.containmentDropAgainst(
          ref.toDF("doc_id", "text"), inc.toDF("doc_id", "text"),
          "doc_id", "text", 4, 5, bitmap = Some(false)) // prefix twin
        .as[Long].collect().toSet
      val tok = (t: String) => t.split(" ").filter(_.nonEmpty).toSet
      val refSets = ref.map(r => tok(r._2))
      val want = inc.collect { case (id, t)
        if !refSets.exists(rs => 5 * tok(t).intersect(rs).size >= 4 * tok(t).size)
        => id }.toSet
      assert(got == want, s"seed $seed: ${got.diff(want).size} extra, " +
        s"${want.diff(got).size} missing of ${want.size}")
    }
  }

  test("jaccardJoinAgainst equals brute-force cross-corpus jaccard " +
      "(no missed pair, no spurious pair, clone groups on both sides)") {
    import spark.implicits._
    for (seed <- Seq(2, 23)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
      val corpus = (1L to 90L).map { id =>
        (id, Seq.fill(2 + rnd.nextInt(6))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // clone groups on both sides: every 4th doc copies doc (id - 3)
      val resolved = corpus.map { case (id, t) =>
        if (id % 4 == 0) (id, corpus((id - 4).toInt)._2) else (id, t)
      }
      val df = resolved.toDF("doc_id", "text")
      val inc = df.filter($"doc_id" % 3 =!= 0)
      val ref = df.filter($"doc_id" % 3 === 0)
      val got = Dedup.jaccardJoinAgainst(inc, ref, "doc_id", "text", 7, 10,
          bitmap = Some(false)) // pin the prefix-filter twin
        .select("id_in", "id_ref").as[(Long, Long)].collect().toSet
      val sets = resolved.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSet
      }.toMap
      val want = (for {
        a <- sets.keys if a % 3 != 0
        b <- sets.keys if b % 3 == 0
        inter = (sets(a) & sets(b)).size; union = (sets(a) | sets(b)).size
        if 10 * inter >= 7 * union
      } yield (a, b)).toSet
      assert(got == want, s"seed $seed: ${got.diff(want).size} spurious, " +
        s"${want.diff(got).size} missed of ${want.size}")
    }
  }

  test("jaccardThresholdSweep counts equal expand-then-count over the " +
      "full join at every θ (size products = doc-pair counts)") {
    import spark.implicits._
    for (seed <- Seq(3, 19)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
      val corpus = (1L to 80L).map { id =>
        (id, Seq.fill(2 + rnd.nextInt(6))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // force clone groups: every 5th doc copies doc (id - 4)
      val resolved = corpus.map { case (id, t) =>
        if (id % 5 == 0) (id, corpus((id - 5).toInt)._2) else (id, t)
      }
      val df = resolved.toDF("doc_id", "text")
      val got = Dedup.jaccardThresholdSweep(df, "doc_id", "text", Seq(70, 80, 90))
        .as[(Int, Long)].collect().toMap
      val joined = Dedup.jaccardJoinExact(df, "doc_id", "text", 7, 10)
        .select("inter_size", "size_a", "size_b").as[(Long, Long, Long)]
        .collect()
      val want = Seq(70, 80, 90).map { t =>
        t -> joined.count { case (i, a, b) => 100L * i >= t * (a + b - i) }.toLong
      }.filter(_._2 > 0).toMap
      assert(got == want, s"seed $seed: got $got want $want")
    }
  }

  test("jaccardJoinExact pair sets are MONOTONE in θ (tightening the " +
      "threshold only removes pairs) — the premise the threshold-sweep " +
      "query derives its θ ∈ {0.7, 0.8, 0.9} counts from") {
    import spark.implicits._
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
      val df = (1L to 50L).map { id =>
        (id, Seq.fill(2 + rnd.nextInt(7))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      def pairsAt(num: Int, den: Int): Set[(Long, Long)] =
        Dedup.jaccardJoinExact(df, "doc_id", "text", num, den)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val p70 = pairsAt(7, 10); val p80 = pairsAt(4, 5); val p90 = pairsAt(9, 10)
      assert(p80.subsetOf(p70),
        s"seed $seed: θ=0.8 emitted ${p80.diff(p70).size} pairs absent at θ=0.7")
      assert(p90.subsetOf(p80),
        s"seed $seed: θ=0.9 emitted ${p90.diff(p80).size} pairs absent at θ=0.8")
      assert(p70.size >= p80.size && p80.size >= p90.size)
    }
  }

  test("dense-vocab BITMAP fast path ≡ prefix-filter twin on all six " +
      "entry points; the 65-token vocab gate refuses the bitmap path " +
      "and the auto gate falls back to the prefix twin there") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    val corpus = (1L to 70L).map { id =>
      (id, Seq.fill(2 + rnd.nextInt(7))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // clone groups: every 5th doc copies doc (id - 4)
    val resolved = corpus.map { case (id, t) =>
      if (id % 5 == 0) (id, corpus((id - 5).toInt)._2) else (id, t)
    }
    val df = resolved.toDF("doc_id", "text")
    val inc = df.filter($"doc_id" % 3 =!= 0)
    val ref = df.filter($"doc_id" % 3 === 0)
    def rows(d: org.apache.spark.sql.DataFrame): Set[String] =
      d.collect().map(_.toString).toSet
    def twin(name: String)(
        f: Option[Boolean] => org.apache.spark.sql.DataFrame): Unit = {
      val bm = rows(f(Some(true))); val pf = rows(f(Some(false)))
      assert(bm == pf, s"$name: bitmap twin diverged — " +
        s"${bm.diff(pf).size} extra, ${pf.diff(bm).size} missing of ${pf.size}")
      assert(bm.nonEmpty, s"$name: degenerate fixture (no rows)")
    }
    twin("jaccardJoinExact")(b =>
      Dedup.jaccardJoinExact(df, "doc_id", "text", 7, 10, bitmap = b))
    twin("containmentJoinExact")(b =>
      Dedup.containmentJoinExact(df, "doc_id", "text", 9, 10, bitmap = b))
    twin("jaccardThresholdSweep")(b =>
      Dedup.jaccardThresholdSweep(df, "doc_id", "text", Seq(70, 80, 90),
        bitmap = b))
    twin("lshRecallSweep")(b =>
      Dedup.lshRecallSweep(df, "doc_id", "text", seeds = 8,
        configs = Seq(2, 4), thetaNum = 4, thetaDen = 5, bitmap = b))
    twin("jaccardJoinAgainst")(b =>
      Dedup.jaccardJoinAgainst(inc, ref, "doc_id", "text", 7, 10, bitmap = b))
    twin("containmentDropAgainst")(b =>
      Dedup.containmentDropAgainst(ref, inc, "doc_id", "text", 4, 5,
        bitmap = b))
    // the gate: a 65+-token vocabulary must refuse the forced bitmap path…
    val wide = (1L to 30L).map(id =>
      (id, (0 to 70).map(i => s"w$i").drop((id % 5).toInt).mkString(" ")))
      .toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.jaccardJoinExact(wide, "doc_id", "text", 4, 5,
        bitmap = Some(true)).collect()
    }
    // …and the AUTO gate must silently take the prefix twin there
    assert(rows(Dedup.jaccardJoinExact(wide, "doc_id", "text", 4, 5)) ==
      rows(Dedup.jaccardJoinExact(wide, "doc_id", "text", 4, 5,
        bitmap = Some(false))))
  }

  test("prefix + positional filters PRUNE on a Zipfian vocabulary " +
      "(the fixture's 31-token vocab structurally defeats them; realistic " +
      "corpora must show candidates ≪ rep pairs) and stay exact there") {
    import spark.implicits._
    // rank-frequency Zipf(s=1.1) over 1000 tokens — the text-corpus shape
    val rnd = new scala.util.Random(19)
    val weights = (1 to 1000).map(k => 1.0 / math.pow(k, 1.1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    def draw(): String = {
      val x = rnd.nextDouble() * cum.last
      s"t${cum.indexWhere(_ >= x)}"
    }
    val df = (1L to 400L).map { id =>
      (id, Seq.fill(8 + rnd.nextInt(18))(draw()).mkString(" "))
    }.toDF("doc_id", "text")
    val reps = Dedup.jaccardReps(df, "doc_id", "text").localCheckpoint()
    val nReps = reps.count()
    val sorted = Dedup.jaccardOrderedPrefix(reps, 4, 5).localCheckpoint()
    val sizeOnly = Dedup.jaccardCandidates(sorted, 4, 5, positional = false).count()
    val cand = Dedup.jaccardCandidates(sorted, 4, 5).count()
    val repPairs = nReps * (nReps - 1) / 2
    info(s"repPairs=$repPairs sizeOnly=$sizeOnly positional=$cand " +
      f"(${100.0 * cand / repPairs}%.2f%% of the pair space)")
    assert(cand * 10 < repPairs,
      s"positional candidates $cand are not ≪ rep pairs $repPairs")
    assert(cand <= sizeOnly)
    // pruning must not cost recall: full pipeline equals brute force here
    val got = Dedup.jaccardJoinExact(df, "doc_id", "text", 4, 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sets = df.collect().map(r => r.getLong(0) ->
      r.getString(1).split(" ").filter(_.nonEmpty).toSet).toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size; union = (sets(a) | sets(b)).size
      if 5 * inter >= 4 * union
    } yield (a, b)).toSet
    assert(got == want, s"${got.diff(want).size} spurious, " +
      s"${want.diff(got).size} missed of ${want.size}")
  }

  test("jaccardJoinExact is a superset of the LSH-verified pairs at the " +
      "same threshold (recall the LSH family cannot prove)") {
    val fixture = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val exact = Dedup.jaccardJoinExact(fixture, "doc_id", "text", 4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.nearDupsFused(fixture, "doc_id", "text", 16, 8, 0.8)
      .collect().map { r =>
        val (x, y) = (r.getLong(0), r.getLong(1))
        (math.min(x, y), math.max(x, y))
      }.toSet
    assert(lsh.subsetOf(exact), s"LSH found ${lsh.diff(exact).size} pairs " +
      "the exact join missed — exact recall is broken")
    assert(exact.nonEmpty)
  }

  test("nearDupClusters: labels = min reachable doc id; clones share a " +
      "cluster; survivors of the CC drop are exactly the cluster labels") {
    val got = Dedup.nearDupClusters(docs, "doc_id", "text", 16, 8, 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1, 2, 5 are clones (identical token sets — candidates through
    // EVERY band, no LSH luck involved); near-dup doc 3 joining the
    // cluster depends on a band match, which the minhash family does not
    // guarantee — so only the clone invariant is pinned here
    assert(got(1L) == 1L && got(2L) == 1L && got(5L) == 1L)
    assert(got(4L) == 4L) // unrelated doc: own singleton cluster
    // every label is its own cluster's minimum member
    got.groupBy(_._2).foreach { case (label, members) =>
      assert(label == members.keys.min)
    }
    // consistency with the drop filter: the survivors ARE the labels
    val kept = Dedup.dropNearDupsCC(docs, "doc_id", "text", 16, 8, 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == got.values.toSet)
  }

  test("nearDupClusters labels EVERY corpus row: zero-token (null/empty/" +
      "whitespace) docs come back as their own singleton clusters") {
    import spark.implicits._
    val withTokenless = docs.unionByName(Seq(
      (90L, ""), (91L, "   "), (92L, null.asInstanceOf[String]),
    ).toDF("doc_id", "text"))
    val got = Dedup.nearDupClusters(withTokenless, "doc_id", "text", 16, 8, 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 90L, 91L, 92L),
      s"every corpus row must be labeled, got ${got.keySet}")
    // tokenless docs are near-dups of nothing — own-id singletons
    assert(got(90L) == 90L && got(91L) == 91L && got(92L) == 92L)
    // and the tokenized side is unchanged by their presence
    assert(got(1L) == 1L && got(2L) == 1L && got(5L) == 1L && got(4L) == 4L)
  }

  test("simhashHammingPairs equals brute-force popcount pairs at radius " +
      "bands-1 (pigeonhole recall) and never exceeds the radius") {
    val fixture = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val got = Dedup.simhashHammingPairs(fixture, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force off the same signature table: every (a < b) pair scored
    val sig = Dedup.simhashMd5(fixture, "doc_id", "text", bits = 48)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- sig.keys; b <- sig.keys if a < b
      d = java.lang.Long.bitCount(sig(a) ^ sig(b))
      if d <= 3
    } yield (a, b, d)).toSet
    assert(got == want, s"${got.diff(want).size} spurious, " +
      s"${want.diff(got).size} missed of ${want.size}")
    assert(got.nonEmpty && got.forall(_._3 <= 3))
  }

  test("simhashHammingPairs at a tighter radius is the popcount-filtered " +
      "subset of the full-radius set") {
    val fixture = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val full = Dedup.simhashHammingPairs(fixture, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val tight = Dedup.simhashHammingPairs(fixture, "doc_id", "text",
        maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(tight == full.filter(_._3 <= 1))
  }

  test("lshBandSweep (fused, one exchange for all configs) equals the " +
      "unfused per-config signatures->bands->occupancy chain") {
    import org.apache.spark.sql.functions._
    val fixture = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val got = Dedup.lshBandSweep(fixture, "doc_id", "text",
        seeds = 16, configs = Seq(2, 4, 8, 16))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val sigs = Dedup.minhashSignatures(fixture, "doc_id", "text", seeds = 16)
      .localCheckpoint()
    val want = Seq(2, 4, 8, 16).map { r =>
      val occ = Dedup.minhashBands(sigs, "doc_id", r)
        .groupBy(col("band"), col("band_sig"))
        .agg(count(lit(1)).as("c"))
        .agg(count(lit(1)), sum(expr("c * (c - 1) div 2")).cast("bigint"))
        .head()
      (r, 16 / r, occ.getLong(0), occ.getLong(1))
    }.toSet
    Dedup.freeCheckpoints(sigs)
    assert(got == want)
  }

  test("lshBandSweep on an empty/token-less corpus still emits one row " +
      "per config (n_buckets 0) — the unfused global-agg semantics") {
    import spark.implicits._
    val empty = Seq((1L, "   "), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rows = Dedup.lshBandSweep(empty, "doc_id", "text",
        seeds = 16, configs = Seq(2, 4, 8, 16))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    assert(rows == Set((2, 0L), (4, 0L), (8, 0L), (16, 0L)))
  }

  test("lshRecallSweep on a corpus with no true near-dup pair reports " +
      "n_true 0 and NULL recall (cross-engine: 0/0 is undefined, not NaN)") {
    import spark.implicits._
    val distinctDocs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "zeta eta theta iota")).toDF("doc_id", "text")
    val rows = Dedup.lshRecallSweep(distinctDocs, "doc_id", "text",
      seeds = 16, configs = Seq(2, 16), thetaNum = 4, thetaDen = 5).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L, s"counts: $r")
      assert(r.isNullAt(4), s"recall must be NULL on n_true=0, got $r")
    }
  }

  test("lshRecallSweep: truth = brute-force rep-level jaccard pairs; " +
      "catch/miss per config matches the collected signature arrays; " +
      "recall is monotone non-increasing in rows-per-band") {
    val fixture = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val got = Dedup.lshRecallSweep(fixture, "doc_id", "text",
        seeds = 16, configs = Seq(2, 4, 8, 16), thetaNum = 4, thetaDen = 5)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // brute truth: rep-level (one doc per distinct token set, min id),
    // exact jaccard >= 0.8 over the raw token sets
    val sets = fixture.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .flatMap { r =>
        val toks = Option(r.getString(1)).getOrElse("")
          .toLowerCase.split(" ").filter(_.nonEmpty).toSet
        if (toks.isEmpty) None else Some(r.getLong(0) -> toks)
      }
    val reps = sets.groupBy(_._2).map { case (ts, ms) => ms.map(_._1).min -> ts }
    val ids = reps.keys.toSeq.sorted
    val truth = (for {
      a <- ids; b <- ids if a < b
      i = (reps(a) intersect reps(b)).size
      j = i.toDouble / (reps(a).size + reps(b).size - i)
      if j >= 0.8
    } yield (a, b)).toSet
    assert(got(2)._1 == truth.size && got(16)._1 == truth.size,
      s"n_true ${got(2)._1} vs brute ${truth.size}")
    // caught counts can never exceed the loosest config's
    for (r <- Seq(4, 8, 16)) {
      assert(got(r)._2 <= got(2)._2, s"caught must not rise past r=2 at $r")
    }
    assert(got(2)._3 >= got(4)._3 && got(4)._3 >= got(8)._3 &&
      got(8)._3 >= got(16)._3, s"monotone: $got")
  }
}
