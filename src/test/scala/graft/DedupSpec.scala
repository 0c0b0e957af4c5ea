package graft

import graft.ops.{Dedup, Text}
import org.apache.spark.sql.functions._

/** Crafted near-duplicate corpora for the dedup family: the synthetic
  * testdata has no true near-dups, so these tests plant them.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
  private val nearDup = base.replace("today", "tonight") // one token differs
  private val unrelated = "completely different words about spark query engines and column pruning"

  private def corpus = Seq((1L, base), (2L, nearDup), (3L, unrelated), (4L, base))
    .toDF("doc_id", "text")

  test("J1: exact dedup keeps min id and counts duplicates") {
    val got = Dedup.exactByHash(corpus, "text", "doc_id")
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 1L), (3L, 1L))) // docs 1+4 identical
  }

  test("minhash+LSH: near-dups collide, unrelated docs do not") {
    val sig = Dedup.minhashSignature(corpus, "text", "doc_id", 8)
    val pairs = Dedup.minhashCandidates(sig, "doc_id", bands = 8, rowsPerBand = 1)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // identical: all bands collide
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near-dup: some band collides
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("native kernels match the declarative shingle/minhash/simhash forms") {
    // The native TextSketch expressions replaced HOF pipelines after
    // round-1 profiling; pin bit-identical semantics against the
    // declarative forms they displaced (which the DuckDB oracle mirrors).
    val declShingleHash = Dedup.shingles(corpus, "text", "doc_id", 3)
      .select($"doc_id", conv(substring(md5($"shingle"), 1, 15), 16, 10)
        .cast("long").as("sh_h"))
      .as[(Long, Long)].collect().toSet
    val nativeShingleHash = corpus.select($"doc_id",
      explode(graft.expressions.TextSketchExpressions.shingleHash64($"text", 3)).as("sh_h"))
      .as[(Long, Long)].collect().toSet
    assert(nativeShingleHash == declShingleHash)

    val declMinhash = Dedup.shingles(corpus, "text", "doc_id", 3)
      .groupBy($"doc_id")
      .agg(array((0 until 8).map(sd =>
        min(md5(concat(lit(s"$sd|"), $"shingle")))): _*).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    val nativeMinhash = Dedup.minhashSignature(corpus, "text", "doc_id", 8)
      .as[(Long, Seq[String])].collect().toMap
    assert(nativeMinhash == declMinhash)

    val declSimhash = corpus.select($"doc_id",
      (0 until 16).map { j =>
        val vote = aggregate(Text.tokens($"text"), lit(0L),
          (acc, w) => acc + when(shiftright(Text.md5Int(w), j) % 2 === 1, 1L).otherwise(-1L))
        when(vote > 0, lit(1L) * (1L << j)).otherwise(0L)
      }.reduce(_ + _).as("h")).as[(Long, Long)].collect().toMap
    val nativeSimhash = corpus.select($"doc_id", Dedup.simhash($"text", 16).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(nativeSimhash == declSimhash)
  }

  test("connected components: chain merges to one cluster, islands stay apart") {
    // Chain 10-11-12-13 needs multiple propagation rounds (diameter 3);
    // pair (20,21) is a separate component; 30 is connected only via 31.
    val edges = Seq((11L, 10L), (11L, 12L), (13L, 12L), (20L, 21L), (31L, 30L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("star edges give identical components to all-pairs candidates") {
    val sig = Dedup.minhashSignature(corpus, "text", "doc_id", 8)
    val viaPairs = Dedup.connectedComponents(
      Dedup.minhashCandidates(sig, "doc_id", 8, 1), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val viaStars = Dedup.connectedComponents(
      Dedup.minhashClusterEdges(sig, "doc_id", 8, 1), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(viaPairs == viaStars)
  }

  test("incrementalComponents == full recompute: merges, new nodes, untouched comps") {
    // old graph: {1-2}, {5-6}, {10-11}; new batch merges the first two
    // via new node 20 (20-2, 20-5), adds isolated new pair {30-31},
    // and leaves {10-11} untouched
    val oldEdges = Seq((1L, 2L), (5L, 6L), (10L, 11L)).toDF("id_a", "id_b")
    val newEdges = Seq((20L, 2L), (20L, 5L), (30L, 31L)).toDF("id_a", "id_b")
    val existing = Dedup.connectedComponents(oldEdges, "id_a", "id_b")
    val inc = Dedup.incrementalComponents(existing, newEdges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val full = Dedup.connectedComponents(
        oldEdges.unionAll(newEdges), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(inc == full)
    assert(inc(20L) == 1L && inc(6L) == 1L) // merged comp takes the global min
    assert(inc(10L) == 10L && inc(11L) == 10L) // untouched comp unchanged
    assert(inc(30L) == 30L && inc(31L) == 30L) // brand-new comp
  }

  test("connected components on an empty edge list returns empty, no error") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty, "id_a", "id_b").count() == 0L)
  }

  test("connected components on LSH pairs: exact dups land in one cluster") {
    val pairs = Dedup.minhashCandidates(
      Dedup.minhashSignature(corpus, "text", "doc_id", 8), "doc_id", 8, 1)
    val clusters = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(clusters(1L) == clusters(4L)) // identical docs share a cluster
    assert(!clusters.contains(3L)) // unrelated doc never entered the pair graph
  }

  test("incremental dedup: indexed near-dups rejected, novel docs kept") {
    // index: base (1). new batch: exact dup of base (4), near-dup (2),
    // unrelated (3) — only the unrelated doc should survive.
    val sigIdx = Dedup.minhashSignature(
      Seq((1L, base)).toDF("doc_id", "text"), "text", "doc_id", 8)
    val sigNew = Dedup.minhashSignature(
      Seq((4L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text"),
      "text", "doc_id", 8)
    val kept = Dedup.incrementalNewDocs(sigNew, sigIdx, "doc_id", 8, 1)
      .as[Long].collect().toSet
    assert(kept == Set(3L))
  }

  test("incremental dedup via persisted index == recompute road; index appends") {
    val sigIdx = Dedup.minhashSignature(
      Seq((1L, base)).toDF("doc_id", "text"), "text", "doc_id", 8)
    val sigNew = Dedup.minhashSignature(
      Seq((4L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text"),
      "text", "doc_id", 8)
    val path = tmpDir("sig-index")
    Dedup.writeSignatureIndex(sigIdx, "doc_id", 8, 1, path)
    val stored = spark.read.parquet(path)
    val viaIndex = Dedup.incrementalNewDocsVsBands(sigNew, stored, "doc_id", 8, 1)
      .as[Long].collect().toSet
    assert(viaIndex == Set(3L)) // same verdicts as the recompute road
    // append the clean doc's bands; it must now collide with itself
    Dedup.writeSignatureIndex(Dedup.minhashSignature(
      Seq((3L, unrelated)).toDF("doc_id", "text"), "text", "doc_id", 8),
      "doc_id", 8, 1, path, append = true)
    val after = Dedup.incrementalNewDocsVsBands(sigNew,
      spark.read.parquet(path), "doc_id", 8, 1).as[Long].collect().toSet
    assert(after.isEmpty)
  }

  test("batch candidates vs persisted index == full self-join filtered to batch") {
    // old corpus: base + near-dup + unrelated; batch: exact dup of
    // base (7), near-dup (8), novel (9) — plus an intra-batch pair.
    val old = Seq((1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text")
    val batch = Seq((7L, base), (8L, nearDup), (9L, base + " novel tail"))
      .toDF("doc_id", "text")
    val path = tmpDir("batch-cand-index")
    Dedup.writeSignatureIndex(
      Dedup.minhashSignature(old, "text", "doc_id", 8), "doc_id", 8, 1, path)
    val got = Dedup.batchCandidatesVsBands(
      Dedup.minhashSignature(batch, "text", "doc_id", 8),
      spark.read.parquet(path), "doc_id", 8, 1)
      .as[(Long, Long)].collect().toSet
    val full = Dedup.minhashCandidates(
      Dedup.minhashSignature(old.unionAll(batch), "text", "doc_id", 8),
      "doc_id", 8, 1)
      .filter(col("id_a") >= 7 || col("id_b") >= 7)
      .as[(Long, Long)].collect().toSet
    assert(got == full)
    assert(got.contains((1L, 7L))) // new–old via the index probe
    assert(got.contains((7L, 8L)) || got.contains((7L, 9L))) // intra-batch
  }

  test("ngram jaccard: identical=1.0, near-dup high, unrelated filtered out") {
    val got = Dedup.ngramJaccardPairs(corpus, "text", "doc_id", 3, 1, 5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(got((1L, 4L)) == 1.0)
    assert(got((1L, 2L)) > 0.5 && got((1L, 2L)) < 1.0)
    assert(!got.contains((1L, 3L)))
  }

  test("containment: short doc quoted inside long doc is directed and jaccard-invisible") {
    val quoted = "alpha beta gamma delta epsilon zeta"
    val container = quoted + " one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq((1L, quoted), (2L, container),
      (3L, "totally different words occupy this entire other document"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "text", "doc_id", 3, 9, 10)
      .select("contained_id", "container_id", "containment")
      .as[(Long, Long, Double)].collect()
    // every shingle of 1 occurs in 2; the direction matters and the
    // reverse (2 in 1) is far below the 9/10 bar
    assert(got.map(r => (r._1, r._2)).toSet == Set((1L, 2L)))
    assert(got.head._3 == 1.0)
    // symmetric Jaccard at the same bar misses the pair entirely
    val jac = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 9, 10)
    assert(jac.count() == 0)
  }

  test("ngram jaccard DF-cut: ubiquitous shingles stop generating pairs") {
    // Two docs that share ONLY a boilerplate header; two true near-dups.
    val header = "terms of service apply to all content"
    val docs = Seq(
      (1L, header + " alpha beta gamma delta epsilon"),
      (2L, header + " zeta eta theta iota kappa"),
      (5L, header + " lambda mu nu xi omicron"),
      (3L, "the quick brown fox jumps over the lazy dog today"),
      (4L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 1, 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.contains((1L, 2L)) && exact.contains((3L, 4L)))
    // cap df at 2: the header shingles (df=3) leave the index; the
    // boilerplate-only pairs disappear, the true near-dup (its shared
    // shingles have df=2) survives
    val capped = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 1, 10, maxDocFreq = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!capped.contains((1L, 2L)) && !capped.contains((1L, 5L)))
    assert(capped.contains((3L, 4L)))
  }

  test("prefix jaccard DF-cut: boilerplate pairs drop, near-dups keep, lower bound holds") {
    val header = "terms of service apply to all content"
    val docs = Seq(
      (1L, header + " alpha beta gamma delta epsilon"),
      (2L, header + " zeta eta theta iota kappa"),
      (5L, header + " lambda mu nu xi omicron"),
      (3L, "the quick brown fox jumps over the lazy dog today"),
      (4L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    // uncut: identical result set to the naive all-pairs form
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 1, 10)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val viaPrefix = Dedup.prefixJaccardJoin(docs, "text", "doc_id", 3, 1, 10)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(viaPrefix == exact)
    // capped: header shingles (df=3) leave both the prefix index and
    // the intersection; boilerplate-only pairs vanish, the true
    // near-dup survives, and surviving similarities are LOWER BOUNDS
    // of the uncut values (denominators keep full set sizes).
    val capped = Dedup.prefixJaccardJoin(docs, "text", "doc_id", 3, 1, 10,
        maxDocFreq = 2)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(!capped.contains((1L, 2L)) && !capped.contains((1L, 5L)))
    assert(capped.contains((3L, 4L)))
    capped.foreach { case (k, v) => assert(v <= exact(k) + 1e-12) }
  }

  test("dedup joins leave no orphaned cache blocks behind") {
    // containmentPairs/prefixJaccardJoin cache their shingle frame
    // internally; after the result materializes the cache must be
    // freed — a long-lived session must not accumulate blocks.
    spark.catalog.clearCache()
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text")
    Dedup.prefixJaccardJoin(docs, "text", "doc_id", 3, 1, 2).count()
    Dedup.containmentPairs(docs, "text", "doc_id", 3, 9, 10).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "internal .cache() frames must be unpersisted after materialization")
  }

  test("simhashPairs generalized pigeonhole == naive all-pairs (blocking complete)") {
    // 60 deterministic mutations of one base doc plant fingerprints at
    // every small hamming distance; the 2(r+1)-block combination
    // blocking must reproduce the naive all-pairs result EXACTLY —
    // including each pair appearing ONCE (the canonical-witness filter
    // replaced the distinct).
    val docs = (1L to 60L).map { i =>
      val words = base.split(" ")
      val mutated = words.updated((i % words.length).toInt, s"w$i")
        .updated(((i * 7) % words.length).toInt, s"x${i % 5}")
      (i, mutated.mkString(" "))
    }.toDF("doc_id", "text")
    val fp = docs.select($"doc_id", Dedup.simhash($"text", 32).as("h"))
      .as[(Long, Long)].collect()
    val naive = (for {
      (ia, ha) <- fp; (ib, hb) <- fp
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb).toLong)).toSeq
    val got = Dedup.simhashPairs(docs, "text", "doc_id", 32, 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.sorted == naive.sorted,
      s"blocked=${got.size} rows vs naive=${naive.size}")
    assert(got.size == got.distinct.size, "pair emitted more than once")
    // exactness is blocking-width-independent: the classic q = r+1
    // split (the small-corpus gate, VERDICT r12 item 6) must produce
    // the identical pair set
    val classic = Dedup.simhashPairs(docs, "text", "doc_id", 32, 3, wide = false)
      .as[(Long, Long, Long)].collect().toSeq
    assert(classic.sorted == naive.sorted)
    assert(classic.size == classic.distinct.size)
  }

  test("incremental simhash vs persisted index == full pairs filtered to batch endpoint") {
    // same planted-mutation corpus as the pigeonhole test, split into
    // an old corpus (2/3) and a batch (doc_id % 3 == 0) — the
    // registered q_incremental_simhash shape
    val docs = (1L to 60L).map { i =>
      val words = base.split(" ")
      val mutated = words.updated((i % words.length).toInt, s"w$i")
        .updated(((i * 7) % words.length).toInt, s"x${i % 5}")
      (i, mutated.mkString(" "))
    }.toDF("doc_id", "text")
    val full = Dedup.simhashPairs(docs, "text", "doc_id", 32, 3)
      .filter(col("id_a") % 3 === 0 || col("id_b") % 3 === 0)
      .as[(Long, Long, Long)].collect().toSet
    for (wide <- Seq(true, false)) {
      val path = tmpDir(s"simhash-index-$wide")
      Dedup.writeSimhashIndex(docs.filter($"doc_id" % 3 =!= 0),
        "text", "doc_id", 32, 3, path, wide = wide)
      val got = Dedup.batchSimhashPairsVsIndex(
        docs.filter($"doc_id" % 3 === 0),
        Dedup.readSimhashIndex(spark, path, "doc_id", 32, 3, wide),
        "text", "doc_id", 32, 3, wide)
        .as[(Long, Long, Long)].collect().toSeq
      assert(got.toSet == full, s"wide=$wide")
      assert(got.size == got.distinct.size,
        s"wide=$wide: pair emitted more than once")
      // parameter drift fails LOUDLY, never as silently-missing buckets
      intercept[IllegalArgumentException] {
        Dedup.readSimhashIndex(spark, path, "doc_id", 32, 2, wide)
      }
      intercept[IllegalArgumentException] {
        Dedup.readSimhashIndex(spark, path, "doc_id", 32, 3, !wide)
      }
    }
  }

  test("readSignatureIndex validates persisted band parameters") {
    val sig = Dedup.minhashSignature(corpus, "text", "doc_id", 8)
    val path = tmpDir("sig-index-meta")
    Dedup.writeSignatureIndex(sig, "doc_id", 8, 1, path)
    assert(Dedup.readSignatureIndex(spark, path, 8, 1).count() > 0)
    intercept[IllegalArgumentException] {
      Dedup.readSignatureIndex(spark, path, 4, 2)
    }
    // append with drifted parameters also fails loudly
    intercept[IllegalArgumentException] {
      Dedup.writeSignatureIndex(sig, "doc_id", 4, 2, path, append = true)
    }
  }

  test("simhash: near-dups within small hamming distance, unrelated far") {
    val fp = corpus.select($"doc_id", Dedup.simhash($"text", 16).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(4L)) // identical text, identical fingerprint
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(2L)) <= 4)
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) >
      java.lang.Long.bitCount(fp(1L) ^ fp(2L)))
  }

  test("CorpusClean: exact dups collapse, near-dups drop, quality gate holds") {
    val longBase = (base + " ") * 3 // ~42 words: inside the 20..1000 band
    val docs = Seq(
      (1L, longBase.trim, "en"),
      (2L, longBase.trim, "en"),                          // exact dup of 1 -> dropped
      (3L, longBase.trim.replace("today", "tonight"), "en"), // near-dup of 1 -> dropped
      (4L, (unrelated + " the a of and ") * 3, "en"),     // distinct, quality-ok
      (5L, "tiny doc", "en")                              // fails min-word gate
    ).toDF("doc_id", "text", "lang")
    val kept = graft.pipelines.CorpusClean.run(docs, minWords = 20, maxWords = 1000)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }

  test("fingerprint: order-sensitive, whitespace-normal") {
    val df = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c")).toDF("doc_id", "text")
    val fp = df.select($"doc_id", Text.fingerprint($"text").as("f"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(3L))
    assert(fp(1L) != fp(2L)) // reordering changes a rolling hash
  }

  test("tfidfCosinePairs: identical docs ~1, df cut drops stopword-only overlap") {
    // docs 1/2 identical; 3 shares ONLY the ubiquitous 'the' with
    // them (df cut at 2 removes it — no candidate pair at all);
    // 4 half-overlaps 1 in rare terms -> strictly between 0 and 1.
    val docs = Seq(
      (1L, "the alpha beta gamma"), (2L, "the alpha beta gamma"),
      (3L, "the zeta eta theta"), (4L, "the alpha beta iota")
    ).toDF("doc_id", "text")
    val got = Dedup.tfidfCosinePairs(docs, "text", "doc_id",
        maxDf = 3L, minCosine = 0.0)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(math.abs(got((1L, 2L)) - 1.0) < 1e-12)
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)) &&
      !got.contains((3L, 4L)))
    val c14 = got((1L, 4L))
    assert(c14 > 0.0 && c14 < 1.0 && math.abs(got((2L, 4L)) - c14) < 1e-15)
  }

  test("tfidfCosineTopK: per-doc bound, LSH gate, drop set = gated pair set") {
    // docs 1/2/3 identical -> same minhash signature -> all three pairs
    // are band candidates with cos 1.0. Doc 0 overlaps 1/2/3 in the
    // terms 'alpha beta' (ungated cosine ~0.15 > 0.1) but shares NO
    // word 3-gram shingle with them, so the MinHash gate excludes the
    // (0, ·) pairs BY DESIGN — the gated contract this test pins.
    val docs = Seq(
      (0L, "alpha beta mu nu"), (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), (3L, "alpha beta gamma delta"),
      (4L, "xi omicron pi rho")
    ).toDF("doc_id", "text")
    def run(k: Int) = Dedup.tfidfCosineTopK(docs, "text", "doc_id",
      maxDf = 5L, minCosine = 0.1, k = k)
    val k2 = run(2).as[(Long, Long, Double)].collect()
    val g3 = k2.filter(_._2 == 3L)
    assert(g3.map(p => (p._1, p._3)).toSet == Set((1L, 1.0), (2L, 1.0)))
    assert(k2.groupBy(_._2).forall(_._2.length <= 2))
    // no-shared-shingle pairs are outside the gate even above threshold
    assert(!run(3).as[(Long, Long, Double)].collect().exists(_._1 == 0L))
    // drop set (distinct id_b) for ANY k equals the GATED unbounded
    // pair set's — reconstructed here as exact pairs ∩ band candidates
    val cand = Dedup.minhashCandidates(
      Dedup.minhashSignature(docs, "text", "doc_id", 8), "doc_id", 8, 1)
    val dropGated = Dedup.tfidfCosinePairs(docs, "text", "doc_id", 5L, 0.1)
      .join(cand, Seq("id_a", "id_b"), "left_semi")
      .select($"id_b").distinct().as[Long].collect().toSet
    val dropK1 = run(1).select($"id_b").as[Long].collect()
    assert(dropK1.toSet == dropGated && dropK1.length == dropK1.toSet.size)
  }

  test("expandClassPairs: rows ∝ members·k on a 10k-member dup class") {
    // One 10k-member exact class (self pair) plus a 100-member class
    // cross-paired with it. The quadratic expansion would stream
    // 10k·(10k−1)/2 + 10k·100 ≈ 5.1e7 rows; the linear form must emit
    // ≤ (members per participating class)·pairs·k.
    val k = 3
    val members = ((0L until 10000L).map(i => (i, 0L)) ++
      (20000L until 20100L).map(i => (i, 20000L))).toDF("__m", "__rep")
    val scored = Seq((0L, 0L, 1.0), (0L, 20000L, 0.9))
      .toDF("id_a", "id_b", "cos").localCheckpoint()
    val exp = Dedup.expandClassPairs(scored, members, k)
    val n = exp.count()
    assert(n <= (10000L + 10100L) * k, s"expansion not linear: $n rows")
    // correctness of the surviving candidates: after the top-k heap,
    // each member's matches are the k smallest eligible ids — verified
    // against a brute-force reconstruction on sampled targets.
    val top = graft.plans.NativeOps.topKPerGroup(exp, Seq("id_b"),
        Seq(("cos", false), ("id_a", true)), k)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._2).view.mapValues(_.map(r => (r._1, r._3)).sortBy(_._1))
    // intra-class target: doc 7 → predecessors 0,1,2 at cos 1.0
    assert(top(7L).toSeq == Seq((0L, 1.0), (1L, 1.0), (2L, 1.0)))
    // cross-class target: doc 20005 → intra heads 20000..20002 at 0.9?
    // No — cross pair gives it class-0 heads 0,1,2 at cos 0.9 AND its
    // own class self pair is absent (only class 0 self-paired), so its
    // k best are class-0 heads (smaller ids, higher... cos 0.9 only).
    assert(top(20005L).toSeq == Seq((0L, 0.9), (1L, 0.9), (2L, 0.9)))
    // boundary: doc 1 has exactly one eligible intra candidate (0)
    assert(top(1L).toSeq == Seq((0L, 1.0)))
  }
}
