package graft.ops

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines — SURVEY.md §2.J:
  * exact (content hash), MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design:
  *  - Exact dedup is one hash-shuffle on the 32-hex digest — the text
  *    itself never shuffles.
  *  - MinHash/LSH turns all-pairs similarity (quadratic) into a
  *    band-bucket equi-join: only documents sharing a band signature
  *    ever meet, so the join key distribution — not the corpus size —
  *    bounds the work. This is the 100 TB path.
  *  - SimHash reduces each document to one 32-bit fingerprint; near-dup
  *    candidates come from fingerprint-band buckets, hamming-checked.
  *  - n-gram Jaccard is exact but restricted to candidate pairs that
  *    share at least one shingle (inverted-index join), never a cross
  *    product.
  *
  * All hashing is md5-based so the DuckDB oracle reproduces results.
  */
object Dedup {

  /** J1 — exact dedup by content digest: one survivor (min of `idCol`)
    * per distinct text, with the duplicate count.
    */
  def exactByHash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct word n-gram shingles per document: (id, shingle) pairs.
    * `sequence(1, size-n+1)` + `slice` builds the shingle list inside
    * one codegen'd expression; explode is the only row expansion.
    */
  def shingles(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    val words = split(col(textCol), " ")
    df.select(col(idCol),
      explode(array_distinct(
        transform(sequence(lit(1), greatest(size(words) - (n - 1), lit(1))),
          i => concat_ws(" ", slice(words, i, lit(n)))))).as("shingle"))
  }

  /** MinHash signature computed MAP-SIDE per document by the native
    * [[graft.expressions.MinHashSig]] kernel: one `sig` array column of
    * `seeds` per-seed minimum md5-hex values over the document's word
    * n-gram shingles. Semantically identical to the declarative
    * shingle-explode + `groupBy(min(md5(seed|shingle)))` pipeline
    * (lexicographic min over hex == byte-wise min over digests), but
    * with NO row expansion and NO aggregation shuffle — at 100 TB the
    * signature stage is a pure scan, and only (id, 8×32-hex) rows ever
    * move. Replaced the explode+groupBy form after round-1 profiling
    * showed interpreted HOF shingling dominated the dedup queries.
    */
  def minhashSignature(df: DataFrame, textCol: String, idCol: String,
      seeds: Int, n: Int = 3): DataFrame =
    Par.widen(df).select(col(idCol),
      graft.expressions.TextSketchExpressions.minhash(col(textCol), n, seeds).as("sig"))

  /** MinHash+LSH candidate pairs: signatures banded `bands` × `rowsPerBand`;
    * documents sharing any band bucket pair up (id_a < id_b). The
    * band-bucket join is an equi-join on the band digest — shuffle on
    * digest, never all-pairs.
    */
  /** The (id, band, bucket) frame behind every LSH operator: one pass,
    * per-band structs exploded (a per-band union would inline and
    * re-execute the signature pipeline once per band).
    */
  private def bandFrame(sig: DataFrame, idCol: String, bands: Int,
      rowsPerBand: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => element_at(col("sig"), i + 1))
      struct(lit(b).as("band"), md5(concat_ws("|", cols: _*)).as("bucket"))
    }
    sig.select(col(idCol), explode(array(bandStructs: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  def minhashCandidates(sig: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    // The band frame is tiny (ids × bands); materialize it once for the
    // self-join's two sides. localCheckpoint, not cache(): checkpoint
    // blocks are ContextCleaner-reclaimed when the caller drops the
    // frame, cache() entries are CacheManager-pinned until clearCache.
    val banded = bandFrame(sig, idCol, bands, rowsPerBand).localCheckpoint()
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("bucket"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Jaccard estimate for candidate pairs from signature agreement:
    * the fraction of seed families whose min-hash matches is an
    * unbiased estimator of the true Jaccard similarity. This is the
    * cheap middle stage of the production dedup pipeline — LSH
    * candidates -> signature estimate (no document text touched) ->
    * exact compare only above threshold. The joins ship signatures
    * (seeds × 32 hex), never text.
    */
  def minhashJaccardEstimate(sig: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val sa = sig.select(col(idCol).as("id_a"), col("sig").as("sig_a"))
    val sb = sig.select(col(idCol).as("id_b"), col("sig").as("sig_b"))
    pairs.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          hit => hit)).cast("double")
          / size(col("sig_a")).cast("double")).as("jaccard_est"))
  }

  /** Star edges for duplicate CLUSTERING from a minhash signature
    * frame: inside every LSH band bucket, link each member to the
    * bucket's minimum id instead of to every other member. Connectivity
    * is identical to the all-pairs candidate graph (a bucket is a
    * clique either way once components are taken), but a bucket of m
    * documents emits m−1 edges instead of m·(m−1)/2 — the all-pairs
    * form is quadratic in bucket size, which is exactly what explodes
    * on a 100 TB near-dup-heavy corpus. One window shuffle on
    * (band, bucket), one distinct to merge edges repeated across bands.
    */
  def minhashClusterEdges(sig: DataFrame, idCol: String, bands: Int,
      rowsPerBand: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    bandFrame(sig, idCol, bands, rowsPerBand)
      .withColumn("hub", min(col(idCol)).over(Window.partitionBy("band", "bucket")))
      .filter(col(idCol) =!= col("hub"))
      .select(col(idCol).as("id_a"), col("hub").as("id_b"))
      .distinct()
  }

  /** Incremental dedup: which documents of a NEW batch are near-dup of
    * an EXISTING corpus, given both sides' minhash signatures. A new
    * document collides if ANY of its band buckets appears in the index
    * — one semi-join on (band, bucket) finds the collided ids, one
    * anti-join keeps the clean remainder. This is the production shape
    * for a growing corpus: the 100 TB index is touched only through
    * its (id, band, bucket) frame (ideally persisted once), never
    * rescanned as text, and the work scales with the NEW batch.
    * Intra-batch duplicates are a separate concern — compose with
    * [[minhashClusterEdges]] + [[connectedComponents]] on the batch.
    */
  def incrementalNewDocs(newSig: DataFrame, indexSig: DataFrame,
      idCol: String, bands: Int, rowsPerBand: Int): DataFrame =
    incrementalNewDocsVsBands(newSig,
      bandFrame(indexSig, idCol, bands, rowsPerBand), idCol, bands, rowsPerBand)

  /** [[incrementalNewDocs]] against a PERSISTED band-frame index (see
    * [[writeSignatureIndex]]): the corpus side is read as stored
    * (band, bucket) rows — no signature recompute, no text touched.
    */
  def incrementalNewDocsVsBands(newSig: DataFrame, indexBands: DataFrame,
      idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandedNew = bandFrame(newSig, idCol, bands, rowsPerBand)
    // INNER join with the CORPUS-sized index on the probe side and the
    // batch-sized band frame on the build side. The previous left-semi
    // (batch ⋈ index) built on the index: a semi-join's hash relation
    // is always its right side, so every micro-batch paid a FULL
    // shuffle of the ever-growing index (the measured q_stream_ingest
    // scaler at 100×). This form streams the index scan past a hash
    // probe of the batch — AQE broadcasts the batch side under the
    // threshold, and above it both sides shuffle (the correct plan
    // there). Multiple bucket collisions per new doc collapse in the
    // same distinct the semi form needed anyway.
    // (partitionBy-written indexes surface `band` as a string
    // partition column — type inference is off by engine contract —
    // so normalize before the join.)
    val collided = indexBands
      .select(col("band").cast("int").as("band"), col("bucket"))
      .join(bandedNew, Seq("band", "bucket"))
      .select(col(idCol)).distinct()
    newSig.select(col(idCol)).join(collided, Seq(idCol), "left_anti")
  }

  /** Candidate pairs INVOLVING a new batch, against a PERSISTED corpus
    * band index ([[writeSignatureIndex]]): new–new pairs from the
    * batch band frame's self-join, new–old pairs from one equi-join of
    * the batch band frame against the stored (id, band, bucket) rows.
    * Work ∝ batch — the corpus is touched only through its index scan
    * streaming past a hash probe of the batch, never re-signed. The
    * pair set is EXACTLY the full-corpus bucket self-join filtered to
    * pairs with a batch endpoint (bucket membership is a pure function
    * of the text), without the corpus-sized signature pass or the
    * old–old quadrant of the candidate join. Pairs come out ordered
    * (id_a < id_b) and deduplicated across bands, like
    * [[minhashCandidates]].
    */
  def batchCandidatesVsBands(newSig: DataFrame, indexBands: DataFrame,
      idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandedNew = bandFrame(newSig, idCol, bands, rowsPerBand)
      .localCheckpoint()
    val a = bandedNew.select(col(idCol).as("id_a"), col("band"), col("bucket"))
    val b = bandedNew.select(col(idCol).as("id_b"), col("band"), col("bucket"))
    val newNew = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    // partitionBy-written indexes surface `band` as a string partition
    // column (type inference off by engine contract) — normalize first
    val newOld = indexBands
      .select(col("band").cast("int").as("band"), col("bucket"),
        col(idCol).as("__idx"))
      .join(bandedNew, Seq("band", "bucket"))
      .filter(col(idCol) =!= col("__idx"))
      .select(least(col(idCol), col("__idx")).as("id_a"),
        greatest(col(idCol), col("__idx")).as("id_b"))
    newNew.unionAll(newOld).distinct()
  }

  /** Persist the corpus band frame for incremental dedup: partitioned
    * by `band` (directory pruning per band) and appendable — ingesting
    * a verified-clean batch appends ITS band rows, so the index grows
    * with the corpus and signatures are computed exactly once per
    * document lifetime. At 100 TB the index is (id, band, bucket) rows
    * only, a tiny fraction of the text it stands for.
    */
  def writeSignatureIndex(sig: DataFrame, idCol: String, bands: Int,
      rowsPerBand: Int, path: String, append: Boolean = false,
      extraMeta: Map[String, String] = Map.empty): Unit = {
    val meta = Map("kind" -> "minhash", "bands" -> bands.toString,
      "rows_per_band" -> rowsPerBand.toString) ++ extraMeta
    if (append) {
      val existing = graft.io.IndexMeta.read(sig.sparkSession, path)
      require(meta.view.filterKeys(_ != "src_fp").toMap ==
        existing.view.filterKeys(_ != "src_fp").toMap,
        s"minhash index at $path was written with $existing; appending with $meta")
    }
    // File-count discipline (the index's read-back cost grows with its
    // FILE count, not just its rows): the band repartition makes every
    // write — bulk build or append — land one file per band, written
    // by `bands` parallel tasks. (A coalesce(1) append was measured
    // serializing a large batch's 2M-row band frame through one task
    // at sf10; the small band shuffle is the cheaper shape at every
    // batch size.)
    bandFrame(sig, idCol, bands, rowsPerBand)
      .repartition(col("band"))
      .write.mode(if (append) "append" else "overwrite")
      .partitionBy("band").parquet(path)
    if (!append) graft.io.IndexMeta.write(sig.sparkSession, path, meta)
  }

  /** Read a [[writeSignatureIndex]] index for probing, validating the
    * persisted band parameters against the caller's — a bands or
    * rowsPerBand drift fails loudly here, never as a candidate join
    * whose buckets silently never collide.
    */
  def readSignatureIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val meta = graft.io.IndexMeta.read(spark, path)
    val want = Map("kind" -> "minhash", "bands" -> bands.toString,
      "rows_per_band" -> rowsPerBand.toString)
    require(want.forall { case (k, v) => meta.get(k).contains(v) },
      s"minhash index at $path was written with $meta; probed with $want")
    spark.read.parquet(path)
  }

  /** Connected components over an undirected candidate-pair edge list
    * — the step that turns pairwise near-dup hits into duplicate
    * CLUSTERS (keep one document per component), which is what a
    * production dedup actually deletes by. Spark has no built-in;
    * this is iterative min-label propagation: each node adopts the
    * minimum label among itself and its neighbors until fixpoint.
    * Edges need not be pre-deduplicated, but a smaller edge list does
    * less work per round — pair it with [[minhashClusterEdges]], not
    * the quadratic all-pairs candidates.
    *
    * Scale shape: rounds = graph diameter (tiny for near-dup clusters
    * — members all share shingles), each round one equi-join + one
    * groupBy, both shuffling on node id only (never text). The first
    * round is fused into initialization (min of self and direct
    * neighbors is one aggregation, no join, no seed-label job).
    * `localCheckpoint` truncates lineage every round — without it the
    * plan doubles per iteration, the classic iterative-Spark trap.
    * Convergence is read off the monotonically decreasing label sum
    * (min-propagation can only lower labels): one cheap aggregate per
    * round instead of a change-detection join.
    *
    * `undOpt` supplies a PRE-SYMMETRIZED caller-owned edge frame
    * (long `src`/`dst`, both directions already present) — the
    * amortized-index contract the graph iterators use: a dst-bucketed
    * staged table hands every round's labels join its hash
    * partitioning and sort order, so the edge side plans with NO
    * exchange per round (the pageRank r9 treatment; an ad-hoc cached
    * frame re-exchanges its edge blocks every round instead). A
    * caller-supplied frame is never cached or unpersisted here.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20, undOpt: Option[DataFrame] = None): DataFrame = {
    val ownUnd = undOpt.isEmpty
    val und = undOpt.getOrElse {
      val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      // Both directions. Reversal cannot collide with the forward form
      // (pairs are ordered), so no dedup shuffle here.
      e.union(e.select(col("dst").as("src"), col("src").as("dst"))).cache()
    }
    // Fused round 1: every node appears as src in the undirected list.
    var labels = und.groupBy("src").agg(min(col("dst")).as("mn"))
      .select(col("src").as("node"), least(col("src"), col("mn")).as("label"))
      .localCheckpoint()
    def checksum(l: DataFrame): java.math.BigDecimal =
      // SUM over an empty frame is null — an empty edge list (a batch
      // with no duplicate pairs at all) must converge, not NPE
      Option(l.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prev = checksum(labels)
    var iter = 1
    var converged = false
    // a superseded round's localCheckpoint blocks are only freed when
    // the RDD is GC'd — on a long-lived session the rounds accumulate
    // in the block store, so free each one as soon as its successor is
    // materialized (the checksum action above guarantees that)
    def cpBlocks(df: DataFrame) = df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    while (iter < maxIter && !converged) {
      // one propagation round per materialization: chaining two rounds
      // before the checkpoint was measured SLOWER (the unmaterialized
      // inner round is referenced by both the union and the join of the
      // outer one, so its whole subtree executes twice)
      val viaNbr = und.join(labels, und("dst") === labels("node"))
        .select(und("src").as("node"), col("label"))
      val prop = labels.union(viaNbr)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint()
      // Path halving: labels are node ids, so label(label(v)) is one
      // self-join away — chase the pointer once per round and a
      // diameter-d chain converges in O(log d) rounds instead of d.
      // `prop` is checkpointed FIRST so the self-join reuses one
      // materialized RDD (an unmaterialized self-reference re-executes
      // the whole propagation subtree per side — measured 8x slower).
      // Every label is a node in `prop` by construction; the left join
      // + coalesce only guards in-flight frames.
      val ptr = prop.select(col("node").as("__pn"), col("label").as("__pl"))
      val next = prop.join(ptr, prop("label") === ptr("__pn"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("__pl"), col("label"))).as("label"))
        .localCheckpoint()
      val cur = checksum(next)
      converged = cur.compareTo(prev) == 0
      prev = cur
      cpBlocks(labels).foreach(_.unpersist(blocking = false))
      cpBlocks(prop).foreach(_.unpersist(blocking = false))
      labels = next
      iter += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] round $iter done at ${System.nanoTime()} checksum $cur")
    }
    if (ownUnd) und.unpersist()
    labels.select(col("node"), col("label").as("cluster_id"))
  }

  /** INCREMENTAL connected-components maintenance: fold a batch of new
    * edges into an existing (node, cluster_id) mapping WITHOUT
    * re-running CC over the corpus. Labels follow the min-node-id
    * convention of [[connectedComponents]] (cluster_id == the
    * component's smallest node id), which makes components
    * CONTRACTIBLE: each new edge's endpoints map to their existing
    * representative (or themselves when unseen), the iterative CC runs
    * only on that CONTRACTED graph — sized by the batch and the
    * components it touches, never the corpus — and because every
    * existing label is itself a min-id, the contracted labels are
    * min-of-mins, i.e. exactly the labels a full recompute would
    * assign. The corpus-sized `existing` table is then touched by ONE
    * linear relabel join against the (tiny, broadcastable) contracted
    * result. Invariant (oracle-checked by `q_incremental_components`):
    * incremental(CC(old), newEdges) == CC(old ∪ newEdges).
    *
    * Output: (node, cluster_id) for every existing node plus every new
    * edge endpoint. At 100 TB this is the nightly dedup-cluster
    * maintenance shape: iterations scale with the day's batch, the
    * only full-table cost is one join.
    */
  def incrementalComponents(existing: DataFrame, newEdges: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    val ex = existing.select(col("node").cast("long").as("node"),
      col("cluster_id").cast("long").as("cluster_id"))
    // Materialize the batch edges once: they are consumed by the
    // contracted CC AND the new-node derivation, and an unmaterialized
    // candidate-generation lineage (band self-join + distinct) would
    // re-execute per consumer. Checkpoint blocks are ContextCleaner-
    // reclaimed (see containmentPairs).
    val e = newEdges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).localCheckpoint()
    val contracted = e
      .join(ex.select(col("node").as("src"), col("cluster_id").as("__rs")),
        Seq("src"), "left")
      .join(ex.select(col("node").as("dst"), col("cluster_id").as("__rd")),
        Seq("dst"), "left")
      .select(coalesce(col("__rs"), col("src")).as("src"),
        coalesce(col("__rd"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
    val repNew = connectedComponents(contracted, "src", "dst")
      .select(col("node").as("__rep"), col("cluster_id").as("__newc"))
    val updatedOld = ex
      .join(broadcast(repNew), ex("cluster_id") === col("__rep"), "left")
      .select(col("node"),
        coalesce(col("__newc"), col("cluster_id")).as("cluster_id"))
    val newNodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(ex.select(col("node")), Seq("node"), "left_anti")
    val mappedNew = newNodes
      .join(broadcast(repNew), col("node") === col("__rep"), "left")
      .select(col("node"), coalesce(col("__newc"), col("node")).as("cluster_id"))
    updatedOld.unionAll(mappedNew)
  }

  // NOTE: a hub-contraction variant (run CC on the hub graph only,
  // attach docs by one join) was implemented, proven equivalent, and
  // MEASURED SLOWER here (7.8 s vs 4.5 s at sf0.1): on a
  // near-dup-heavy corpus the hub graph is not much smaller, and the
  // contraction costs two extra shuffles (hub-set semi-join +
  // collect_set clique expansion) before the same iterative loop.
  // Keep the direct star-graph propagation.

  /** Contrastive training triples: (anchor, positive, negative) where
    * anchor/positive are LSH near-dup candidates and the negative is a
    * DETERMINISTIC pseudo-random pick — the pair's md5 indexes into
    * the corpus through [[Text.corpusShuffle]]'s banded global rank
    * (dense 1..n by construction, no single-task sort, no RNG state).
    * The standard embedding-model data op, reproducible across runs
    * and engines. The rare negative that collides with its own anchor
    * pair is filtered.
    */
  def contrastiveTriples(df: DataFrame, textCol: String, idCol: String,
      seeds: Int, seed: String): DataFrame = {
    val sig = minhashSignature(df, textCol, idCol, seeds)
    val pos = minhashCandidates(sig, idCol, seeds, 1)
    val ranked = Text.corpusShuffle(df.select(col(idCol)), idCol, seed)
      .select(col(idCol).as("neg_id"), col("shuffle_rank"))
    val n = df.agg(count(lit(1)).as("__n"))
    pos.crossJoin(broadcast(n))
      .withColumn("__pick",
        Text.md5Int(concat_ws("|", col("id_a"), col("id_b"))) % col("__n") + 1)
      .join(ranked, col("__pick") === col("shuffle_rank"))
      .filter(col("neg_id") =!= col("id_a") && col("neg_id") =!= col("id_b"))
      .select(col("id_a").as("anchor"), col("id_b").as("positive"), col("neg_id").as("negative"))
  }

  /** SimHash fingerprint over `bits` bits (each bit j: sign of the sum
    * of ±1 votes from every token whose md5-int has bit j set). Native
    * [[graft.expressions.SimHash]] kernel — one md5 per token (the
    * declarative `aggregate` fold recomputed it per token PER BIT),
    * no explode, no shuffle.
    */
  def simhash(text: Column, bits: Int): Column =
    graft.expressions.TextSketchExpressions.simhash(text, bits)

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("bigint")

  /** SimHash near-duplicate PAIRS within Hamming distance `radius`,
    * found by pigeonhole block blocking — the scale path for simhash
    * dedup. GENERALIZED pigeonhole (VERDICT r11 item 5): split the
    * fingerprint into q = 2·(radius+1) equal blocks; two fingerprints
    * within `radius` differ in at most `radius` blocks, so they agree
    * EXACTLY on some (q − radius)-block COMBINATION — candidates are
    * equi-joins on (comboId, concatenated block values), never
    * all-pairs. Doubling the block count over the classic q = r+1
    * scheme widens each bucket key from `bits/(r+1)` to
    * `bits·(r+2)/(2r+2)` effective bits: at 32 bits / radius 3 the
    * classic 8-bit blocks gave 256 bucket values per block and a
    * measured 3.0·10⁹-pair candidate stream over a 500 k-doc corpus
    * (30 s of a 40 s sf10 wall); the C(8,5) = 56 combinations of
    * 4-bit blocks key on 20 bits — measured 1.8·10⁸ candidates, 16×
    * less, max bucket 935. The cost is 56 (vs 4) keyed rows per doc —
    * a corpus-linear explode that shuffles (id, fp, key) longs only.
    * Falls back to the classic r+1 split when 2(r+1) ∤ bits. The
    * exact popcount(xor) filter removes false candidates either way,
    * so blocking stays lossless and the result identical. The
    * ≤-radius filter runs BEFORE pair dedup so the distinct sees only
    * true near-dup rows, not the full candidate stream.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      bits: Int, radius: Int, wide: Boolean = true): DataFrame = {
    val blk = simhashBlocking(bits, radius, wide)
    val keyed = simhashKeyed(df, textCol, idCol, bits, blk)
    simhashPairsFromKeyed(keyed, idCol, radius, blk)
  }

  /** Pigeonhole blocking parameters shared by the simhash family:
    * block count `qq`, block width `w`, block `mask`, the agreeing
    * block `combos`, and the canonical-witness `lut` (first combo
    * contained in each 2^qq block-agreement mask). `wide = false`
    * forces the classic q = r+1 split — the right trade below ~50 k
    * docs, where the 2(r+1) scheme's combo explode costs more than the
    * narrower buckets save (sf0.1 measured 1.45 s classic vs 3.29 s
    * wide, while sf10 is 48 s vs 11.4 s the other way). Exactness is
    * blocking-independent (the popcount filter is applied either way).
    */
  private case class SimhashBlocking(qq: Int, w: Int, mask: Long,
      combos: Seq[Seq[Int]], lut: Seq[Int])

  private def simhashBlocking(bits: Int, radius: Int, wide: Boolean): SimhashBlocking = {
    val q0 = radius + 1
    require(bits % q0 == 0, s"bits=$bits must split into ${q0} blocks")
    val qq = if (wide && radius >= 1 && bits % (2 * q0) == 0) 2 * q0 else q0
    val agree = qq - radius
    val w = bits / qq
    val mask = (1L << w) - 1
    val combos = (0 until qq).combinations(agree).toSeq
    val lut = (0 until (1 << qq)).map { mm =>
      combos.indexWhere(_.forall(b => ((mm >> b) & 1) == 1))
    }
    SimhashBlocking(qq, w, mask, combos, lut)
  }

  /** (id, fp, comboId `c`, concatenated block value `v`) rows — one per
    * document per agreeing-block combination; the frame both sides of
    * every simhash candidate join are keyed on.
    */
  private def simhashKeyed(df: DataFrame, textCol: String, idCol: String,
      bits: Int, blk: SimhashBlocking): DataFrame = {
    def blockVal(b: Int) =
      shiftrightunsigned(col("fp"), b * blk.w).bitwiseAND(lit(blk.mask))
    val fp = Par.widen(df).select(col(idCol), simhash(col(textCol), bits).as("fp"))
    fp.select(col(idCol), col("fp"),
      explode(array(blk.combos.zipWithIndex.map { case (bs, ci) =>
        struct(lit(ci).as("c"),
          bs.zipWithIndex.foldLeft(lit(0L).cast("long")) {
            case (acc, (b, pos)) =>
              acc.bitwiseOR(shiftleft(blockVal(b), pos * blk.w))
          }.as("v"))
      }: _*)).as("bk"))
      .select(col(idCol), col("fp"), col("bk.c").as("c"), col("bk.v").as("v"))
  }

  /** CANONICAL-WITNESS condition: a true pair appears once per
    * agreeing combo, so emit it only from the FIRST combo (by
    * enumeration order) contained in the pair's block-agreement mask
    * — a 2^q-entry LUT evaluated per candidate in codegen. Key
    * equality already implies the combo ⊆ mask, so exactly one
    * witness survives and no pair-dedup distinct is needed.
    */
  private def simhashWitness(blk: SimhashBlocking, fpA: Column, fpB: Column,
      c: Column): Column = {
    val xor = fpA.bitwiseXOR(fpB)
    val agreeMask = (0 until blk.qq).map(b =>
      when(shiftrightunsigned(xor, b * blk.w).bitwiseAND(lit(blk.mask)) === 0,
        lit(1 << b)).otherwise(lit(0))).reduce(_ + _)
    c === element_at(array(blk.lut.map(lit): _*), agreeMask + lit(1))
  }

  private def simhashPairsFromKeyed(keyed: DataFrame, idCol: String,
      radius: Int, blk: SimhashBlocking): DataFrame = {
    // Witness dedup (see [[simhashWitness]]) kills the pair-dedup
    // shuffle (the measured second-biggest stage at sf10). The MERGE
    // hint pins sort-merge: the keyed frame is corpus×combos rows —
    // AQE's broadcast pick built a 28M-entry driver map (40+ s), and
    // per-partition hash builds OOM an 8 GB heap at 32 slots.
    keyed.select(col(idCol).as("id_a"), col("fp").as("fp_a"), col("c"), col("v"))
      .join(keyed.select(col(idCol).as("id_b"), col("fp").as("fp_b"), col("c"), col("v"))
        .hint("merge"),
        Seq("c", "v"))
      .filter(col("id_a") < col("id_b"))
      .filter(simhashWitness(blk, col("fp_a"), col("fp_b"), col("c")))
      .withColumn("hamming", hamming(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= radius)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Persist the simhash combo-key frame for incremental near-dup
    * maintenance — the SimHash sibling of [[writeSignatureIndex]]:
    * partitioned by comboId `c` (directory pruning per combo, one file
    * per combo per write) and appendable, so fingerprints are computed
    * exactly once per document lifetime and the 100 TB corpus is only
    * ever touched through its (c, v, id, fp) rows. A `_graft_meta.json`
    * sidecar records the blocking parameters; [[readSimhashIndex]]
    * validates them so a probe with drifted parameters fails LOUDLY
    * instead of silently missing collisions (buckets that never agree).
    */
  def writeSimhashIndex(df: DataFrame, textCol: String, idCol: String,
      bits: Int, radius: Int, path: String, append: Boolean = false,
      wide: Boolean = true, extraMeta: Map[String, String] = Map.empty): Unit = {
    val blk = simhashBlocking(bits, radius, wide)
    val meta = Map("kind" -> "simhash", "bits" -> bits.toString,
      "radius" -> radius.toString, "qq" -> blk.qq.toString) ++ extraMeta
    if (append) {
      val existing = graft.io.IndexMeta.read(df.sparkSession, path)
      require(meta.view.filterKeys(_ != "src_fp").toMap ==
        existing.view.filterKeys(_ != "src_fp").toMap,
        s"simhash index at $path was written with $existing; appending with $meta")
    }
    simhashKeyed(df, textCol, idCol, bits, blk)
      .repartition(col("c"))
      .write.mode(if (append) "append" else "overwrite")
      .partitionBy("c").parquet(path)
    if (!append) graft.io.IndexMeta.write(df.sparkSession, path, meta)
  }

  /** Read a [[writeSimhashIndex]] index for probing, validating the
    * persisted blocking parameters against the caller's — a drifted
    * contract fails loudly here, never as an incomplete candidate set.
    * (partitionBy-written indexes surface `c` as a string partition
    * column — type inference is off by engine contract — so normalize
    * on read.)
    */
  def readSimhashIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, bits: Int, radius: Int, wide: Boolean = true): DataFrame = {
    val blk = simhashBlocking(bits, radius, wide)
    val meta = graft.io.IndexMeta.read(spark, path)
    val want = Map("kind" -> "simhash", "bits" -> bits.toString,
      "radius" -> radius.toString, "qq" -> blk.qq.toString)
    require(want.forall { case (k, v) => meta.get(k).contains(v) },
      s"simhash index at $path was written with $meta; probed with $want")
    spark.read.parquet(path)
      .select(col("c").cast("int").as("c"), col("v"), col(idCol), col("fp"))
  }

  /** SimHash near-dup pairs INVOLVING a new batch, against a PERSISTED
    * combo-key index ([[writeSimhashIndex]] / [[readSimhashIndex]]) —
    * the work-∝-batch maintenance road, matching
    * [[batchCandidatesVsBands]]'s contract: new–new pairs from the
    * batch's own pigeonhole self-join, new–old pairs from ONE equi-join
    * of the batch's keyed frame against the stored (c, v, id, fp) rows.
    * The corpus is touched only through its index scan streaming past a
    * hash probe of the batch, never re-fingerprinted. The pair set
    * EXACTLY equals [[simhashPairs]] over (index corpus ∪ batch)
    * filtered to pairs with a batch endpoint (fingerprints and bucket
    * keys are pure functions of the text; pair-set equality is
    * spec-pinned in DedupSpec). Canonical-witness dedup applies to both
    * quadrants — the same combo is keyed on both sides, so each true
    * pair survives exactly one (c, v) join row and no distinct is
    * needed. No merge hint on the probe join: the batch keyed frame is
    * localCheckpointed (sizes known to AQE), and unlike the corpus
    * self-join a batch-sized build side is the plan we WANT when it
    * fits. Contract: the index holds only documents NOT in the batch.
    */
  def batchSimhashPairsVsIndex(newDf: DataFrame, indexKeyed: DataFrame,
      textCol: String, idCol: String, bits: Int, radius: Int,
      wide: Boolean = true): DataFrame = {
    val blk = simhashBlocking(bits, radius, wide)
    val keyedNew = simhashKeyed(newDf, textCol, idCol, bits, blk)
      .localCheckpoint()
    val newNew = simhashPairsFromKeyed(keyedNew, idCol, radius, blk)
    val newOld = indexKeyed
      .select(col("c").cast("int").as("c"), col("v"),
        col(idCol).as("__idx"), col("fp").as("__fpx"))
      .join(keyedNew, Seq("c", "v"))
      .filter(col(idCol) =!= col("__idx"))
      .filter(simhashWitness(blk, col("fp"), col("__fpx"), col("c")))
      .withColumn("hamming", hamming(col("fp"), col("__fpx")))
      .filter(col("hamming") <= radius)
      .select(least(col(idCol), col("__idx")).as("id_a"),
        greatest(col(idCol), col("__idx")).as("id_b"), col("hamming"))
    newNew.unionAll(newOld)
  }

  /** n-gram Jaccard similarity over candidate pairs sharing >= 1
    * shingle (inverted-index self-join). `jaccard = |A∩B| / (|A|+|B|-|A∩B|)`
    * computed from exact integer counts. The threshold filter uses an
    * integer cross-multiplication so no float boundary is involved.
    */
  /** `maxDocFreq`: optional skew guard for corpus scale. A shingle
    * present in d documents emits d·(d-1)/2 candidate pairs, so one
    * boilerplate phrase shared by 1 M documents is a 5·10^11-pair hot
    * key no partitioning can save. Capping document frequency drops
    * those shingles from the index, making the reported similarity a
    * LOWER BOUND (set sizes still count capped shingles; intersections
    * no longer can) — the standard inverted-index DF-cut: what is lost
    * is exactly similarity carried by ubiquitous boilerplate, which
    * near-dup pipelines usually want to ignore anyway. Off (0) by
    * default; the oracle-checked demo runs exact.
    */
  /** Asymmetric CONTAINMENT pairs: directed (contained, container)
    * rows where at least `num`/`den` of the contained document's
    * distinct n-gram shingles also occur in the container — the
    * quote/boilerplate/subset signal symmetric Jaccard misses (a short
    * doc fully quoted inside a long one has low Jaccard but containment
    * ≈ 1). Same inverted-index shape as [[ngramJaccardPairs]]: the join
    * ships 60-bit shingle hashes, candidates are pairs sharing ≥ 1
    * shingle, and the threshold is an integer cross-multiplication.
    * Both directions derive from ONE undirected intersect frame.
    */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String, n: Int,
      num: Int, den: Int, maxDocFreq: Long = 0L): DataFrame = {
    val hashed = Par.widen(df).select(col(idCol),
      graft.expressions.TextSketchExpressions.shingleHash64(col(textCol), n).as("shs"))
      .cache()
    val shAll = hashed.select(col(idCol), explode(col("shs")).as("sh_h"))
    // DF cut (doc above): capped shingles leave the index while set
    // sizes keep counting them — containment becomes a LOWER BOUND.
    // The rare-shingle set is VOCABULARY-sized (at sf10: millions of
    // longs) — hint the semi-join to shuffle-hash so AQE never builds
    // it as a driver-side broadcast map (measured: broadcast OOM on the
    // 8 GB driver; the hash builds per-partition instead).
    val sh =
      if (maxDocFreq <= 0) shAll
      else shAll.join(
        shAll.groupBy(col("sh_h")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxDocFreq).select(col("sh_h"))
          .hint("shuffle_hash"),
        Seq("sh_h"), "left_semi")
    val sizes = hashed.select(col(idCol), size(col("shs")).cast("bigint").as("n_sh"))
    // MERGE hint (VERDICT r11 item 5): the join sides are EXPLODED
    // posting rows — Generate does not scale the plan's size estimate,
    // so AQE reads the pre-explode byte size and picks broadcast; at
    // sf10 that built a 26M-row driver HashedRelation and was the
    // measured 28 s dominator of the ngram demo's wall. Sort-merge
    // streams the posting lists instead (shuffle_hash would rebuild
    // the same oversized map per partition — measured OOM on an 8 GB
    // heap in the simhash twin).
    val inter = sh.select(col(idCol).as("id_a"), col("sh_h"))
      .join(sh.select(col(idCol).as("id_b"), col("sh_h")).hint("merge"),
        Seq("sh_h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
    val ws = inter
      .join(sizes.withColumnRenamed("n_sh", "n_a"), col("id_a") === sizes(idCol)).drop(idCol)
      .join(sizes.withColumnRenamed("n_sh", "n_b"), col("id_b") === sizes(idCol)).drop(idCol)
    val aInB = ws.filter(col("n_inter") * den >= col("n_a") * num)
      .select(col("id_a").as("contained_id"), col("id_b").as("container_id"),
        (col("n_inter").cast("double") / col("n_a").cast("double")).as("containment"))
    val bInA = ws.filter(col("n_inter") * den >= col("n_b") * num)
      .select(col("id_b").as("contained_id"), col("id_a").as("container_id"),
        (col("n_inter").cast("double") / col("n_b").cast("double")).as("containment"))
    // Materialize eagerly, then free the shared shingle cache — a
    // long-lived session must not accumulate orphaned cache blocks
    // (checkpoint blocks, unlike cache() entries, are reclaimed by the
    // ContextCleaner once the frame is unreferenced — the Graph.scala
    // lineage discipline).
    val out = aInB.unionAll(bInA).localCheckpoint()
    hashed.unpersist(blocking = false)
    out
  }

  /** Exact set-similarity JOIN via PPJoin-style prefix filtering
    * (Chaudhuri et al. 2006 / Xiao et al. 2008): order each document's
    * distinct shingle hashes by GLOBAL rarity (document frequency asc,
    * hash asc — a total order shared by all documents), and keep only
    * each document's first `|S| − ceil(t·|S|) + 1` hashes as its
    * prefix. Any pair with Jaccard ≥ t MUST share a prefix hash (if
    * both prefixes miss the other set, the intersection fits inside
    * both suffixes, ≤ ceil(t·|S|) − 1 < t·|S| ≤ t·|union| — the
    * pigeonhole lemma), so candidates come from a prefix-only
    * inverted-index join: vastly fewer postings than the full index
    * ([[ngramJaccardPairs]] joins every shingle; this joins ~(1−t) of
    * them, and the rarity order puts the survivors in the SMALLEST
    * buckets). Two further PPJoin filters prune candidates BEFORE the
    * expensive verification join, both exact upper bounds on the kept
    * intersection I′ against the output predicate
    * I′·(num+den) ≥ (n_a+n_b)·num (the cross-multiplied form of
    * J ≥ t with full-size denominators):
    *   - LENGTH filter: I′ ≤ min(n_cut_a, n_cut_b) — a pair whose
    *     smaller (cut) set can't reach the required overlap is dead on
    *     arrival (with no DF cut this is the classic t·|a| ≤ |b|
    *     size-ratio bound).
    *   - POSITIONAL filter: a shared prefix token at ranks (i, j) of
    *     the SAME global (df, hash) order bounds the overlap by the
    *     common-prefix part plus the common-suffix part:
    *     I′ ≤ min(i,j) + min(n_cut_a−i, n_cut_b−j). If the true I′
    *     meets the threshold then EVERY shared token's bound does, so
    *     filtering match rows before `distinct` loses nothing.
    * Verification is PER-PAIR, not per-posting: each surviving
    * candidate pair joins the two documents' (already distinct)
    * shingle-hash ARRAYS and counts `size(array_intersect(...))` in
    * codegen — one self-contained row per candidate, versus the
    * posting-explode form (candidates × shingles rows through two
    * joins and a groupBy) that dominated the old plan. Work scales
    * with candidates; the per-doc array side is one row per document
    * (broadcast-sized after AQE at bench SF, id-partitioned at scale).
    * Threshold is an integer cross-multiplication; ceil is integer
    * arithmetic; result is identical to the naive all-pairs form,
    * which is the oracle.
    */
  def prefixJaccardJoin(df: DataFrame, textCol: String, idCol: String, n: Int,
      thresholdNum: Int, thresholdDen: Int, maxDocFreq: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = Par.widen(df).select(col(idCol),
      graft.expressions.TextSketchExpressions.shingleHash64(col(textCol), n).as("shs"))
      .cache()
    val tok = hashed.select(col(idCol), explode(col("shs")).as("sh_h"))
    val sizes = hashed.select(col(idCol), size(col("shs")).cast("bigint").as("n_sh"))
    // Document frequency via groupBy+join, NOT count().over(partitionBy
    // (sh_h)): the window form sorts the full exploded frame by sh_h,
    // and boilerplate shingles make those exactly the hot partitions —
    // the partial-aggregating groupBy ships one (hash, count) row per
    // distinct shingle instead.
    val dfc = tok.groupBy(col("sh_h")).agg(count(lit(1)).as("df"))
    // Optional DF cut (same contract as [[ngramJaccardPairs]]): drop
    // shingles present in more than maxDocFreq documents from BOTH the
    // prefix index and the intersection counts while denominators keep
    // full set sizes, so the reported jaccard is a LOWER BOUND and the
    // prefix lemma still guarantees completeness for every pair whose
    // lower bound clears t (n_a + n_b − I' ≥ |S'_a ∪ S'_b| ⟹ bound ≥ t
    // implies cut-set Jaccard ≥ t, which the cut-set prefix finds).
    val dfcKept = if (maxDocFreq > 0) dfc.filter(col("df") <= maxDocFreq) else dfc
    // MERGE hint: tok is an EXPLODED posting frame whose plan size
    // estimate is the pre-explode byte size, so the planner's default
    // pick here was measured 3× slower at sf10 (15.4 → 5.0 s); the
    // vocab side is fine to sort and the shape stays safe when the
    // vocabulary outgrows any broadcast threshold.
    val tokKept = tok.join(dfcKept.hint("merge"), Seq("sh_h"))
    // rn and the per-doc surviving-set size share one (idCol) exchange.
    val docW = Window.partitionBy(col(idCol))
    val ranked = tokKept
      .withColumn("rn", row_number()
        .over(docW.orderBy(col("df"), col("sh_h"))).cast("bigint"))
      .withColumn("n_cut", count(lit(1)).over(docW).cast("bigint"))
    // With no DF cut the kept sets ARE the full sets (n_full == n_cut,
    // kept array == shs), so the sizes join and kept-set re-aggregation
    // are skipped entirely in the common path.
    val prefixBase = ranked.filter(col("rn") <=
        col("n_cut") - expr(s"CAST((n_cut * $thresholdNum + ${thresholdDen - 1}) DIV $thresholdDen AS BIGINT)") + 1)
    val prefix =
      if (maxDocFreq > 0)
        prefixBase.join(sizes, Seq(idCol))
          .select(col(idCol), col("sh_h"), col("rn"), col("n_cut"),
            col("n_sh").as("n_full"))
      else prefixBase.select(col(idCol), col("sh_h"), col("rn"), col("n_cut"),
        col("n_cut").as("n_full"))
    // Candidate pairs are generated WITHIN each prefix bucket, not by
    // a self-join: one sh_h shuffle folds each bucket's postings into
    // an array, and the pair lambda emits (id_a, id_b) with the length
    // and positional filters applied inline. A self-join would
    // reference the prefix subtree twice — Spark re-executes the whole
    // scan→hash→explode→df→window chain once per join side (the
    // round-5 bench outlier) — while the bucket form consumes it once.
    // Bucket width is bounded by the rarity order (prefixes hold each
    // document's RAREST shingles) and by the DF cut when set, so the
    // in-bucket pair loop never sees a boilerplate-sized posting list.
    val tPlus = thresholdNum + thresholdDen
    val bucket = prefix.groupBy(col("sh_h")).agg(collect_list(struct(
      col(idCol).as("id"), col("rn"), col("n_cut").as("nc"),
      col("n_full").as("nf"))).as("xs"))
    val pairExpr = expr(s"""
      flatten(transform(xs, x ->
        transform(filter(xs, y ->
            x.id < y.id
            AND least(x.nc, y.nc) * $tPlus >= (x.nf + y.nf) * $thresholdNum
            AND (least(x.rn, y.rn) + least(x.nc - x.rn, y.nc - y.rn)) * $tPlus
                >= (x.nf + y.nf) * $thresholdNum),
          y -> struct(x.id AS id_a, y.id AS id_b))))""")
    // The candidate frame is byte-tiny (two longs per row) but each
    // row costs an array_intersect downstream — AQE coalesces the
    // post-distinct exchange to 1-2 partitions on byte size and
    // serializes the verification; repartition keeps the kernel stage
    // as wide as the session (same guard rationale as [[Par.widen]]).
    val cand = bucket.select(explode(pairExpr).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b")).distinct()
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    // kset is SORTED ONCE PER DOCUMENT so the per-pair intersection
    // count runs the allocation-free two-pointer kernel — the
    // array_intersect+size form built a hash set and materialized the
    // intersection array PER CANDIDATE (measured 17 s of the 19.6 s
    // sf10 verification stage at 31M candidates).
    val docInfo =
      if (maxDocFreq > 0)
        sizes.withColumnRenamed("n_sh", "n_full")
          .join(tokKept.groupBy(col(idCol))
            .agg(sort_array(collect_list(col("sh_h"))).as("kset")), Seq(idCol))
      else hashed.select(col(idCol),
        size(col("shs")).cast("bigint").as("n_full"),
        sort_array(col("shs")).as("kset"))
    val out = cand
      .join(docInfo.select(col(idCol).as("id_a"), col("n_full").as("n_a"),
        col("kset").as("ks_a")), Seq("id_a"))
      .join(docInfo.select(col(idCol).as("id_b"), col("n_full").as("n_b"),
        col("kset").as("ks_b")), Seq("id_b"))
      .withColumn("n_inter", graft.expressions.VectorExpressions
        .sortedIntersectCount(col("ks_a"), col("ks_b")))
      .filter(col("n_inter") * thresholdDen >=
        (col("n_a") + col("n_b") - col("n_inter")) * thresholdNum)
      .select(col("id_a"), col("id_b"), col("n_inter"), col("n_a"), col("n_b"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double")).as("jaccard"))
      // Eager materialize + free the shingle cache (see containmentPairs).
      .localCheckpoint()
    hashed.unpersist(blocking = false)
    out
  }

  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String, n: Int,
      thresholdNum: Int, thresholdDen: Int, maxDocFreq: Long = 0L): DataFrame = {
    // Join on a 60-bit md5-prefix hash of the shingle, not the string:
    // long equi-join keys shuffle ~3x less than ~20-char UTF8 strings
    // and hash/compare faster. Collision odds at 60 bits are ~1e-7 per
    // corpus; the oracle applies the identical hash so results agree
    // exactly either way. The native ShingleHash64 kernel produces the
    // whole distinct-hash array in one loop per document (the
    // declarative transform/slice/md5 chain was the round-1 bench
    // outlier: interpreted lambda dispatch per shingle), and set sizes
    // fall out of the array length map-side — no groupBy shuffle.
    val hashed = Par.widen(df).select(col(idCol),
      graft.expressions.TextSketchExpressions.shingleHash64(col(textCol), n).as("shs"))
      .cache()
    val shAll = hashed.select(col(idCol), explode(col("shs")).as("sh_h"))
    val sizes = hashed.select(col(idCol), size(col("shs")).cast("bigint").as("n_sh"))
    val sh =
      if (maxDocFreq <= 0) shAll
      else {
        val rare = shAll.groupBy(col("sh_h"))
          .agg(count(lit(1)).as("__df")).filter(col("__df") <= maxDocFreq)
          .select(col("sh_h"))
        shAll.join(rare, Seq("sh_h"), "left_semi")
      }
    // MERGE hint (VERDICT r11 item 5): the join sides are EXPLODED
    // posting rows — Generate does not scale the plan's size estimate,
    // so AQE reads the pre-explode byte size and picks broadcast; at
    // sf10 that built a 26M-row driver HashedRelation and was the
    // measured 28 s dominator of the ngram demo's wall. Sort-merge
    // streams the posting lists instead (shuffle_hash would rebuild
    // the same oversized map per partition — measured OOM on an 8 GB
    // heap in the simhash twin).
    val inter = sh.select(col(idCol).as("id_a"), col("sh_h"))
      .join(sh.select(col(idCol).as("id_b"), col("sh_h")).hint("merge"),
        Seq("sh_h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("n_sh", "n_a"), col("id_a") === sizes(idCol)).drop(idCol)
      .join(sizes.withColumnRenamed("n_sh", "n_b"), col("id_b") === sizes(idCol)).drop(idCol)
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .filter(col("n_inter") * thresholdDen >= col("n_union") * thresholdNum)
      .select(col("id_a"), col("id_b"),
        (col("n_inter").cast("double") / col("n_union").cast("double")).as("jaccard"))
  }

  /** J1/J2-ext — WEIGHTED sparse document similarity: cosine over
    * tf·idf vectors, the retrieval-grade sibling of the set-based
    * [[ngramJaccardPairs]]/[[prefixJaccardJoin]] (Jaccard treats "the"
    * and a rare entity as equally informative; tf·idf does not).
    *
    * Semantics: vectors live in the STOPWORD-PRUNED term space — terms
    * with document frequency > `maxDf` are dropped BEFORE weighting,
    * and both the dot products and the norms use the pruned vectors,
    * so the output is the true cosine of what was compared (not an
    * underestimate against full-vector norms). idf is the rational
    * N/df (no libm log — the [[graft.queries.QText]] BM25 precedent):
    * monotone in the standard idf, so ranking/thresholding semantics
    * survive while every weight stays an exact-integer IEEE ratio.
    *
    * Scale shape: ONE tokenization pass into (doc, term, tf) rows; df
    * is a term-level aggregate of that frame (never a corpus rescan);
    * candidates come from the inverted-index self-join on the term key
    * whose fan-out `maxDf` caps per posting list — the standard
    * posting-length cut. Per-pair dot products and per-doc norms
    * accumulate as DECIMAL(38,18) power sums (order-independent, the
    * repo's moment discipline), so the oracle hash-matches unrounded.
    *
    * CONTRACT NOTE (bounded-approximate by default): `postingCap`
    * additionally keeps only each term's top-`postingCap` postings by
    * weight, so beyond that density the operator is an APPROXIMATION —
    * pairs attested only through capped terms are dropped, and
    * surviving cosines are computed on the capped matrix (norms
    * included, so the value stays self-consistent). With every posting
    * list under the cap the result is identical to the exact form;
    * pass `postingCap = Int.MaxValue` to force exactness when the
    * fan-out is known to be safe. Every oracle replays the cap.
    */
  def tfidfCosinePairs(df: DataFrame, textCol: String, idCol: String,
      maxDf: Long, minCosine: Double, postingCap: Int = 500,
      nDocsOpt: Option[Long] = None): DataFrame = {
    // map-side term frequencies — see [[tfidfCosineTopK]]'s tf note
    val tf = Par.widen(df)
      .select(col(idCol), explode(
        graft.expressions.TextSketchExpressions.termCounts(col(textCol))).as("tc"))
      .select(col(idCol), col("tc.t").as("t"), col("tc.tf").as("tf"))
    // bounded: one scalar (callers with a memoized corpus count pass it
    // via nDocsOpt so the timed query body skips the count job)
    val n = df.sparkSession.range(1)
      .select(lit(nDocsOpt.getOrElse(df.count())).as("n"))
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val wtAll = tf.join(dfreq, Seq("t")).join(broadcast(n))
      .select(col(idCol), col("t"),
        (col("tf") * (col("n").cast("double") / col("df").cast("double")))
          .as("wgt"))
    // HARD posting cap on top of the relative df cut: keep each term's
    // top-`postingCap` postings by (weight desc, id asc — deterministic,
    // both engines sort the same exact-ratio doubles). The relative cut
    // alone stops pruning once N grows past df/0.1 for mid-band terms
    // (measured: a 10× corpus with shard-local vocab pushed one term's
    // posting self-join to 900 s in a single task), while the capped
    // index bounds any term's pair fan-out at postingCap²/2 and the
    // whole stage at |terms|·cap² — the standard bounded-index
    // approximation retrieval systems ship. Norms and dots both read
    // the CAPPED matrix, so the cosine stays self-consistent and the
    // oracle replays the cap exactly; with postings under the cap
    // (every SF the contract checks at the default maxDf) the result
    // is IDENTICAL to the uncapped form.
    // PERSIST the capped matrix: it feeds THREE consumers (the norm
    // aggregate and both sides of the posting self-join) whose
    // exchanges differ, so Catalyst cannot reuse one — without the
    // cache the tokenize → tf-aggregate → df-join → posting-top-k
    // pipeline runs three times end-to-end (measured at sf1: the
    // triple recompute was most of a 112–145 s wall; plan audit shows
    // 8 scans / 28 exchanges, zero ReusedExchange). Values are
    // unaffected: the decimal power sums are order-independent.
    // Callers' sweep harnesses clearCache between queries; the 100 TB
    // form writes this matrix to storage once (same shape as the
    // cascade's durable stage boundaries).
    val wt = wtAll
      .withColumn("__rn", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy(col("t"))
        .orderBy(col("wgt").desc, col(idCol).asc)))
      .filter(col("__rn") <= postingCap)
      .drop("__rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val norms = wt.groupBy(col(idCol))
      .agg(sqrt(sum((col("wgt") * col("wgt")).cast("decimal(38,18)"))
        .cast("double")).as("nrm"))
    val dots = wt.select(col(idCol).as("id_a"), col("t"), col("wgt").as("w_a"))
      .join(wt.select(col(idCol).as("id_b"), col("t"), col("wgt").as("w_b")),
        Seq("t"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum((col("w_a") * col("w_b")).cast("decimal(38,18)"))
        .cast("double").as("dotp"))
    // Materialize eagerly, then free the posting-matrix cache: cache()
    // entries are CacheManager-pinned (never GC-reclaimed), so a lazy
    // return would leak one matrix per call on a long-lived session
    // (the checkpoint blocks, by contrast, die with the RDD reference
    // — the containmentPairs discipline).
    val out = dots
      .join(norms.select(col(idCol).as("id_a"), col("nrm").as("n_a")), Seq("id_a"))
      .join(norms.select(col(idCol).as("id_b"), col("nrm").as("n_b")), Seq("id_b"))
      .withColumn("cos", col("dotp") / (col("n_a") * col("n_b")))
      .filter(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cos"))
      .localCheckpoint()
    wt.unpersist(blocking = false)
    out
  }

  /** LSH-GATED weighted near-dup, OUTPUT bounded to each doc's top-`k`
    * earlier matches (`id_a < id_b`, grouped by `id_b`) — the form a
    * 100 TB pipeline consumes, and the round-9 answer to the last
    * super-linear scaler. [[tfidfCosinePairs]]' posting self-join does
    * work ∝ |terms| × postingCap² — the vocabulary grows with the
    * corpus, so the stage was measured ~45× at 100× data. Here the
    * CANDIDATE pairs come from the MinHash band index instead (the
    * [[minhashCandidates]] equi-join — work ∝ documents, ~6× at 100×),
    * and tf·idf cosine is computed ONLY for candidates:
    *
    *   1. signatures map-side (native kernel, no row expansion),
    *      band-bucket equi-join → candidate (id_a, id_b) pairs;
    *   2. ONE tokenization pass → (doc, term, tf); df aggregate with
    *      the relative `maxDf` stopword cut; weights tf·(N/df) — NO
    *      posting cap: the matrix no longer self-joins, so the index
    *      stays exact and norms cover the full pruned vector;
    *   3. per-candidate dot products: candidates ⋈ vectors on id_a,
    *      then an equi-join on (id_b, term) — work ∝ candidates ×
    *      document length, never ∝ vocabulary × cap².
    *
    * CONTRACT (bounded-approximate): a pair is reported only when it
    * shares ≥ 1 of `bands` MinHash band buckets AND its pruned-space
    * cosine clears `minCosine` — the standard retrieval gate (block by
    * cheap sketch, score the survivors exactly). Recall against the
    * ungated form is 1 − (1 − J)^bands in the pair's shingle-Jaccard J
    * (≈ 0.94 at J = 0.3 with 8 single-row bands); pairs similar only
    * through rare terms but sharing no 3-gram shingle are by-design
    * outside the gate. The DuckDB oracle replays the gate exactly.
    *
    * Determinism: ranked on the ROUNDED cosine (6 dp — the repo's
    * cross-engine double contract) with `id_a` as total-order
    * tie-break, through the native two-phase
    * [[graft.plans.TopKPerGroup]] operator (partial bounded heaps
    * before the exchange, no sort). Because ranking is BY cosine,
    * qualifying pairs are a prefix of each group's cos-ordered list,
    * so for any k ≥ 1 the distinct `id_b` set (the first-seen-wins
    * near-dup DROP set) equals the unbounded gated form's.
    */
  /** EXACT-CLASS CONTRACTION (the sf10 finding): cosine is a pure
    * function of the TEXT, and attestation is a pure function of the
    * signature (also text-derived) — so documents with byte-identical
    * text are interchangeable everywhere in this operator. On a
    * dup-heavy corpus the candidate graph is dominated by intra- and
    * cross-pairs of exact-duplicate classes (measured at sf10: 8.2M
    * candidate pairs over 500k docs, scoring them with vector payloads
    * was ~60 s of a ~75 s wall), so the operator:
    *
    *   a. groups docs into exact-text classes (sha256), one
    *      representative (min id) per class;
    *   b. gates + scores at CLASS level — signatures, candidates,
    *      vectors, dots all over representatives only. Document
    *      frequencies stay CORPUS-level (each term's df sums the
    *      class sizes of the classes containing it) and the idf N is
    *      the corpus count, so every weight — and therefore every
    *      cosine — is bit-identical to the uncontracted computation;
    *   c. expands surviving class pairs (cos ≥ threshold ONLY — the
    *      below-threshold mass never expands) back to member pairs as
    *      24-byte rows, intra-class pairs from the class self-pair,
    *      and bounds with the native top-k heaps.
    *
    * The result set is EXACTLY the uncontracted gated form's (the
    * DuckDB oracle replays the uncontracted definition), but the
    * heavy per-pair scoring runs once per distinct-text pair.
    */
  def tfidfCosineTopK(df: DataFrame, textCol: String, idCol: String,
      maxDf: Long, minCosine: Double, k: Int,
      seeds: Int = 8, shingleN: Int = 3,
      nDocsOpt: Option[Long] = None,
      // BY-NAME: evaluated once, at the gate stage (after the class
      // aggregate + pair-mass probe) — a caller that materializes its
      // shared signature pass on another thread (runV2) overlaps that
      // checkpoint with the class chain instead of serializing the two.
      sigOpt: => Option[DataFrame] = None): DataFrame = {
    // dev profiling (GRAFT_TFIDF_PROF=1): wall per materialization
    // point — every lap boundary below is an eager action, so the
    // laps partition the operator's real cost
    val profOn = sys.env.contains("GRAFT_TFIDF_PROF")
    var profLast = System.nanoTime()
    def lap(name: String): Unit = if (profOn) {
      val now = System.nanoTime()
      System.err.println(f"[tfidfK] $name%-16s ${(now - profLast) / 1e9}%7.2f")
      profLast = now
    }
    // a — exact-text classes. members is consumed by both expansion
    // joins; clsAgg by the rep restriction, class-size df, and
    // self-pairs: checkpoint both (blocks die with the RDD reference).
    val clsAgg = df
      .select(col(idCol), sha2(col(textCol), 256).as("__h"))
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as("__rep"), count(lit(1)).as("__cn"))
      .localCheckpoint()
    lap("clsAgg")
    // ADAPTIVE: contraction pays off exactly when duplication is real,
    // and the signal is the INTRA-CLASS PAIR MASS Σ cn·(cn−1)/2 — the
    // candidate pairs exact duplication alone would force the direct
    // path to score (a class is a full LSH clique: equal text, equal
    // signature, every band collides). The distinct FRACTION is the
    // wrong test: a 94%-distinct corpus with one 30k-member class (the
    // post-excision empty-text class at sf10) hides ~4·10⁸ intra-class
    // pairs — measured 400+ s direct vs ~100 s contracted — while a
    // raw mostly-distinct corpus has negligible mass and the class
    // machinery would only add its ~25% expansion overhead. Two driver
    // scalars decide (the AQE spirit — plan by measured data); both
    // paths emit IDENTICAL rows (cosine and attestation are pure
    // functions of the text), so the choice is invisible to the
    // oracle.
    // ONE aggregate over the class frame yields BOTH driver scalars:
    // Σ__cn is exactly |df| (every doc lands in exactly one class, null
    // text included — sha2(null) groups under the null key), so the
    // corpus-count scan the nDocsOpt-less callers used to pay (runV2's
    // timed body at sf10: a full documents pass) collapses into the
    // same class-sized job as the pair-mass probe.
    val massRow = clsAgg.agg(
      sum(col("__cn")).as("n"),
      sum(col("__cn") * (col("__cn") - 1)).as("pm")).head()
    val nTotal = nDocsOpt.getOrElse(
      Option(massRow.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L))
    val pairMass = Option(massRow.get(1))
      .map(_.asInstanceOf[Long]).getOrElse(0L) / 2
    lap("pairMass")
    val contract = pairMass > nTotal / 10
    val repIds = clsAgg.select(col("__rep").as(idCol))
    val repDf = if (contract) df.join(repIds, Seq(idCol), "left_semi") else df
    // b1 — the MinHash gate over representatives (one bucket per seed,
    // the q_minhash_dedup gate). Pipelines that already sketched the
    // corpus (runV2 shares one pass with the later LSH stage) pass
    // sigOpt; signatures are per-doc pure functions of the text, so
    // the rep restriction yields identical frames either way. Class
    // SELF-pairs (≥ 2 members) are gated in by construction — equal
    // text means equal signature means every band collides. sigOpt is
    // BY-NAME and evaluated exactly here, so a caller materializing the
    // shared sketch on a spare thread (runV2) overlaps it with the
    // class chain above and joins before the candidate stage — at most
    // TWO corpus-wide passes ever run concurrently (a measured 3-way
    // overlap on an 8 GB heap was a net loss at sf10).
    val sig = sigOpt
      .map(s => if (contract) s.join(repIds, Seq(idCol), "left_semi") else s)
      .getOrElse(minhashSignature(repDf, textCol, idCol, seeds, shingleN))
    // members is consumed ONLY by the final expansion, so its corpus
    // re-hash + join materializes on a spare thread while the main
    // thread builds the candidate gate — independent job DAGs, same
    // deterministic frames, awaited where first used.
    val membersF: Option[Future[DataFrame]] =
      if (!contract) None else Some(Future {
        df.select(col(idCol), sha2(col(textCol), 256).as("__h"))
          .join(clsAgg.select(col("__h"), col("__rep")), Seq("__h"))
          .select(col(idCol).as("__m"), col("__rep"))
          .localCheckpoint()
      }(scala.concurrent.ExecutionContext.global))
    val selfPairs = clsAgg.filter(col("__cn") >= 2)
      .select(col("__rep").as("id_a"), col("__rep").as("id_b"))
    val candBase = minhashCandidates(sig, idCol, seeds, 1)
    val cand = (if (contract) candBase.unionAll(selfPairs) else candBase)
      .localCheckpoint() // three consumers: doc restriction + join sides
    lap("candidates")
    val candDocs = cand.select(col("id_a").as(idCol))
      .unionAll(cand.select(col("id_b").as(idCol))).distinct()
    // b2 — term frequencies MAP-SIDE via the native kernel (one row
    // per DISTINCT term per rep straight off the scan; the
    // token-explode → (doc, term) aggregation this replaces shuffled
    // every token of the corpus). df counts stay CORPUS-level: each
    // rep's presence contributes its whole class size.
    val tf = Par.widen(repDf)
      .select(col(idCol), explode(
        graft.expressions.TextSketchExpressions.termCounts(col(textCol))).as("tc"))
      .select(col(idCol), col("tc.t").as("t"), col("tc.tf").as("tf"))
    // one scalar; memoized callers pass it (see tfidfCosinePairs)
    val n = df.sparkSession.range(1).select(lit(nTotal).as("n"))
    val dfreq = (if (contract)
      tf.join(clsAgg.select(col("__rep").as(idCol), col("__cn")), Seq(idCol))
        .groupBy(col("t")).agg(sum(col("__cn")).as("df"))
    else tf.groupBy(col("t")).agg(count(lit(1)).as("df")))
      .filter(col("df") <= maxDf)
    // TERM IDS: vectors ship as LONG-keyed sorted maps (primitive-
    // packed payloads + two-pointer merge dots — see
    // [[graft.expressions.MapDotKernel.mapDotDecLong]]; the string-
    // keyed form's pair-stream shuffle was the measured sf10 scoring
    // dominator). Any run-consistent term→long INJECTION preserves
    // every product. xxhash64(t) is deterministic and RETRY-STABLE —
    // monotonically_increasing_id was not (ADVICE r10: a lost map
    // output recomputed mid-materialization can re-number terms,
    // silently zeroing shared-term products) — and injectivity is
    // ASSERTED below on the materialized vocabulary (64-bit hash over
    // a ≤10⁷-term vocab: collision odds ~10⁻⁶; the check turns the
    // residual risk into a loud failure, never a wrong answer).
    // Checkpointing the (t, df, tid) vocab costs no extra corpus scan
    // (wt's join materialized this chain anyway) and makes the
    // assertion an agg over a vocab-sized in-memory frame.
    val dfreqT = dfreq.withColumn("tid", xxhash64(col("t"))).localCheckpoint()
    val idCheck = dfreqT.agg(count(lit(1)).as("nt"),
      countDistinct(col("tid")).as("ntid")).head()
    require(idCheck.getLong(0) == idCheck.getLong(1),
      s"xxhash64 term-id collision: ${idCheck.getLong(0)} terms -> " +
        s"${idCheck.getLong(1)} ids; rerun with a salted hash")
    lap("dfreqT+idCheck")
    val wt = tf.join(dfreqT, Seq("t")).join(broadcast(n))
      .select(col(idCol), col("tid"),
        (col("tf") * (col("n").cast("double") / col("df").cast("double")))
          .as("wgt"))
    // Candidate reps' full pruned vectors fold into ONE row each (norm
    // + term → weight map) — the single doc-keyed shuffle of the
    // scoring stage. Norms cover the whole pruned vector, so the
    // cosine stays the true cosine of what was compared.
    val vecs = wt
      .join(candDocs, Seq(idCol), "left_semi")
      .groupBy(col(idCol))
      .agg(
        sqrt(sum((col("wgt") * col("wgt")).cast("decimal(38,18)"))
          .cast("double")).as("nrm"),
        sort_array(collect_list(struct(col("tid"), col("wgt")))).as("__s"))
      // co-sorted (tid, wgt) arrays → the kernel's sorted-merge layout;
      // map_from_arrays PRESERVES the given order, so keyArray stays
      // ascending through the shuffle
      .select(col(idCol), col("nrm"),
        map_from_arrays(expr("transform(__s, x -> x.tid)"),
          expr("transform(__s, x -> x.wgt)")).as("vec"))
      .localCheckpoint() // one materialization: freezes tids, feeds both join sides
    lap("vecs")
    // fail fast (ADVICE r11): if the background members job already
    // died (e.g. executor OOM), surface it here instead of after all
    // scoring work completes at the final Await
    membersF.flatMap(_.value).foreach(_.get)
    // Map-side dot product per class pair through the NATIVE
    // [[graft.expressions.MapDotKernel.mapDotDecLong]] kernel: a
    // two-pointer merge over the sorted long key arrays; every product
    // is the identical IEEE double the per-doc join would produce,
    // accumulated with Spark-CAST-exact DECIMAL(38,18) semantics
    // (order-independent, and non-shared terms' exact-zero addends
    // cannot change the sum), so the DuckDB oracle's shared-term join
    // reproduces it bit for bit. Lineage: an interpreted
    // `aggregate(map_keys(...))` HOF fold (the r8 per-pair dominator)
    // → the string-keyed hash kernel (r9) → this sorted-long form,
    // which also HALVES the pair-stream shuffle payload (the r10
    // measured scoring dominator at sf10). ExpressionsSpec pins all
    // three bitwise-equal.
    val dotExpr = graft.expressions.VectorExpressions
      .mapDotDecLong(col("v_a"), col("v_b"))
    // SHUFFLE-HASH hints: a sort-merge join would SORT the pair stream
    // WITH its map payloads; hashing builds on the rep-sized vecs side
    // and streams the pairs untouched.
    val clsPairs = cand
      .join(vecs.select(col(idCol).as("id_a"), col("nrm").as("n_a"),
        col("vec").as("v_a")).hint("shuffle_hash"), Seq("id_a"))
      .join(vecs.select(col(idCol).as("id_b"), col("nrm").as("n_b"),
        col("vec").as("v_b")).hint("shuffle_hash"), Seq("id_b"))
      .withColumn("dotp", dotExpr)
      .withColumn("cos", col("dotp") / (col("n_a") * col("n_b")))
      .filter(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
    // c — LINEAR expansion to member pairs (only ≥-threshold class
    // pairs ever expand; see [[expandClassPairs]] for the domination
    // argument that makes it work ∝ members·k, not |A|·|B|). In the
    // direct path the scored pairs already ARE the member pairs.
    val scored = if (contract) clsPairs.localCheckpoint() else null
    if (contract) lap("score")
    def cpBlocks(df: DataFrame) = Option(df).toSeq
      .flatMap(_.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      })
    // FREE the heavy intermediate checkpoints' blocks (ADVICE r10):
    // localCheckpoint blocks die only with their RDD reference, so the
    // rep-sized vector/candidate frames would otherwise stay pinned
    // for the session — the same superseded-boundary discipline the
    // Graph and TrainingPrep iterators follow.
    if (contract) {
      // AWAIT the background members job BEFORE freeing clsAgg's
      // checkpoint blocks (ADVICE r11): the future's join reads those
      // blocks and localCheckpoint truncated their lineage, so an
      // unpersist racing a still-running members job is an
      // unrecoverable 'checkpoint block not found'. members is itself
      // checkpointed, so once it exists the upstream frames are safe
      // to drop — the returned plan reads ONLY scored + members
      // (bounded / doc-sized) and the expansion + top-k stay LAZY.
      val members = Await.result(membersF.get, Duration.Inf)
      (cpBlocks(clsAgg) ++ cpBlocks(cand) ++ cpBlocks(dfreqT) ++
        cpBlocks(vecs)).foreach(_.unpersist(blocking = false))
      graft.plans.NativeOps.topKPerGroup(
        expandClassPairs(scored, members, k),
        Seq("id_b"),
        Seq(("cos", false), ("id_a", true)), k)
    } else {
      // the direct path's lazy plan reads the cand + vecs checkpoints:
      // materialize the bounded (≤ docs·k) result first, then free all
      val out = graft.plans.NativeOps.topKPerGroup(clsPairs, Seq("id_b"),
        Seq(("cos", false), ("id_a", true)), k).localCheckpoint()
      lap("score+topk")
      (cpBlocks(clsAgg) ++ cpBlocks(cand) ++ cpBlocks(dfreqT) ++
        cpBlocks(vecs)).foreach(_.unpersist(blocking = false))
      out
    }
  }

  /** Expands scored exact-class pairs back to member pairs in work
    * ∝ members·pairs·k — NEVER the |A|·|B| cross product.
    *
    * Why truncation is lossless: the only consumer is a top-k heap per
    * `id_b` ordered (cos DESC, id_a ASC), every member pair from one
    * class pair carries the SAME cosine, and pairs are emitted ordered
    * (min, max) so `id_b` is always the larger id. For a target member
    * y, a class pair's candidates are the other class's members x < y;
    * any x beyond that class's k SMALLEST such members is dominated in
    * y's heap by k same-cosine smaller-id candidates from the same
    * class pair and can never place. Since members < y of an
    * id-sorted class form a prefix, the k smallest of them are the
    * class's global k smallest ids ("heads") filtered to < y — a
    * bounded per-class array, computed once.
    *
    * So: heads = k smallest member ids per class (native bounded
    * heaps, one pass over members); each scored pair {A, B} emits, per
    * member y of A, heads(B) ∩ (< y) and, per member y of B,
    * heads(A) ∩ (< y); the self pair {A, A} emits heads(A) ∩ (< y)
    * per member y. Member sets of distinct classes are disjoint and
    * every member has exactly one class, so each (x, y) surfaces at
    * most once — exactly as in the full expansion.
    *
    * @param scored class pairs (id_a = rep A ≤ id_b = rep B, cos),
    *               self pairs id_a == id_b for intra-class mass;
    *               MUST be materialized (two consumers).
    * @param members (__m member id, __rep class rep) — one row per doc.
    */
  private[graft] def expandClassPairs(scored: DataFrame, members: DataFrame,
      k: Int): DataFrame = {
    // heads are only consulted for classes that SURVIVED scoring — the
    // semi-join restriction keeps the bounded-heap pass ∝ paired-class
    // members, not corpus members (scored is materialized and tiny, so
    // AQE broadcasts it: a map-side filter, no members shuffle)
    val prs = scored.select(col("id_a").as("__rep"))
      .unionAll(scored.select(col("id_b").as("__rep"))).distinct()
    val heads = graft.plans.NativeOps
      .topKPerGroup(members.join(prs, Seq("__rep"), "left_semi"),
        Seq("__rep"), Seq(("__m", true)), k)
      .groupBy(col("__rep"))
      .agg(sort_array(collect_list(col("__m"))).as("__hs"))
    // y-side class / other-side class per direction; the self pair
    // appears once (no reversed row — id_a === id_b would double it).
    val perSide = scored
      .select(col("id_a").as("__yc"), col("id_b").as("__oc"), col("cos"))
      .unionAll(scored.filter(col("id_a") =!= col("id_b"))
        .select(col("id_b").as("__yc"), col("id_a").as("__oc"), col("cos")))
    // pairs ⋈ heads first (2·pairs rows, ≤ k-element array payload),
    // then one hash join against the member frame — members stream,
    // the bounded pair+heads side builds.
    val withHeads = perSide
      .join(heads.select(col("__rep").as("__oc"), col("__hs"))
        .hint("shuffle_hash"), Seq("__oc"))
      .select(col("__yc"), col("__hs"), col("cos"))
    members.select(col("__m").as("__y"), col("__rep").as("__yc"))
      .join(withHeads.hint("shuffle_hash"), Seq("__yc"))
      .select(explode(filter(col("__hs"),
        h => h < col("__y"))).as("id_a"),
        col("__y").as("id_b"), col("cos"))
  }
}
