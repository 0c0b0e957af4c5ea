package graft.queries

import graft.Tables
import graft.expressions.VectorExpressions
import graft.ops.{Scalars, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Demo queries + DuckDB oracles for similarity search over embeddings
  * (SURVEY.md §2.J J2, E5): brute-force cosine top-k, IVF cluster
  * assignment, and the element-wise centroid aggregate.
  *
  * Determinism: all vector arithmetic is double-widened sequential
  * folds in array order (bit-identical to DuckDB's list_sum of the
  * transformed list); cross-row centroid sums use fixed-point 2^53
  * longs ([[Scalars.fxLong]]) so partition order cannot matter.
  */
object QSimilarity {
  type Q = (SparkSession, String) => DataFrame

  /** DuckDB-side double dot product of two list columns, sequential. */
  private def dDot(a: String, b: String) =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private def ivfIndexPath(dir: String): String =
    s"target/tmp/q_ivf_index_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
  private def ivfPqIndexPath(dir: String): String =
    s"target/tmp/q_ivfpq_index_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"

  private def seedCentroids(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))

  /** Untimed setup (see [[QIo.stages]]): index BUILDS are a one-time
    * ingest cost, and timing them inside the search queries hides the
    * pruned-read win the indexes exist for. Bench/Verify stage these
    * before the query loop; the queries build-if-missing as a dev
    * fallback.
    */
  val stages: Map[String, (SparkSession, String) => Unit] = Map(
    "q_ivf_search_pruned" -> ((s, dir) => stageIvfIndex(s, dir)),
    "q_ivf_knn_join" -> ((s, dir) => stageIvfIndex(s, dir)),
    "q_ivfpq_search" -> ((s, dir) => stageIvfPqIndex(s, dir)))

  private def stageIvfIndex(s: SparkSession, dir: String): Unit = {
    val emb = Tables(s, dir).embeddings
    Similarity.ivfBuild(emb.select(col("vec_id"), col("embedding")),
      "embedding", "vec_id", seedCentroids(emb), "cvec", "cid", ivfIndexPath(dir))
  }

  private def stageIvfPqIndex(s: SparkSession, dir: String): Unit = {
    val emb = Tables(s, dir).embeddings
    val cb = Similarity.pqCodebooks(emb, "embedding", "vec_id", m = 8, k = 16)
    Similarity.ivfPqBuild(emb.select(col("vec_id"), col("embedding")),
      "embedding", "vec_id", seedCentroids(emb), "cvec", "cid", cb, ivfPqIndexPath(dir))
  }

  val queries: Map[String, Q] = Map(
    // J2 — brute-force cosine top-k against the vec_id=0 query vector
    // (collected once on the driver — a scalar input, broadcast with
    // the plan; the scan side never shuffles, top-k is TakeOrdered).
    "q_cosine_topk" -> ((s, dir) => {
      VectorExpressions.register(s)
      val emb = Tables(s, dir).embeddings
      val q = emb.filter(col("vec_id") === 0).select(col("embedding")).head()
        .getSeq[Float](0)
      val qv = typedlit(q)
      // native codegen'd dot (bit-identical to the HOF fold) — the HOF
      // form evaluates its lambda interpreted per element
      val d = VectorExpressions.dot _
      emb.select(col("vec_id"),
        (d(col("embedding"), qv) / (sqrt(d(col("embedding"), col("embedding"))) * sqrt(d(qv, qv))))
          .as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
    }),

    // Matryoshka (MRL) truncated-dimension search: cosine top-k over
    // the FIRST 16 of 64 dims — the cheap first-stage ranking a
    // matryoshka-trained embedding admits (4× less I/O and FLOPs per
    // candidate; survivors re-rank at full width via q_cosine_topk).
    // Truncation is a map-only slice; scoring stays on the native
    // codegen dot kernel.
    "q_embed_truncate" -> ((s, dir) => {
      VectorExpressions.register(s)
      val emb = Tables(s, dir).embeddings
      val q = emb.filter(col("vec_id") === 0).select(col("embedding")).head()
        .getSeq[Float](0).take(16)
      val qv = typedlit(q)
      val d = VectorExpressions.dot _
      val t = slice(col("embedding"), 1, 16)
      emb.select(col("vec_id"),
        (d(t, qv) / (sqrt(d(t, t)) * sqrt(d(qv, qv)))).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
    }),

    // J2-ext — TWO-STAGE retrieval, composed: stage 1 ranks the whole
    // corpus on the 16-dim matryoshka truncation (4× less I/O and
    // FLOPs per candidate) and keeps the top 50 with a total
    // tie-break; stage 2 re-ranks ONLY those 50 at full width. This is
    // the production retrieval shape — cheap recall stage feeding an
    // exact precision stage — and the whole cascade is deterministic,
    // so the oracle replays both stages end to end. At 100 TB stage 1
    // is the only corpus-wide pass (map-only slice + dot + top-k);
    // stage 2 touches 50 rows.
    "q_two_stage_rerank" -> ((s, dir) => {
      VectorExpressions.register(s)
      val emb = Tables(s, dir).embeddings
      val full = emb.filter(col("vec_id") === 0).select(col("embedding")).head()
        .getSeq[Float](0)
      val q16 = typedlit(full.take(16))
      val qf = typedlit(full)
      val d = VectorExpressions.dot _
      val t = slice(col("embedding"), 1, 16)
      val cand = emb.select(col("vec_id"), col("embedding"),
          (d(t, q16) / (sqrt(d(t, t)) * sqrt(d(q16, q16)))).as("c16"))
        .orderBy(col("c16").desc, col("vec_id").asc)
        .limit(50)
      val e = col("embedding")
      cand.select(col("vec_id"),
          (d(e, qf) / (sqrt(d(e, e)) * sqrt(d(qf, qf)))).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
    }),

    // J2-ext — packed-bit Hamming prefilter: binarize each embedding
    // to ONE 64-bit sign sketch (bit i set iff component i > 0), rank
    // by popcount(xor) against vec_id=0's sketch. This is the cheapest
    // possible first stage at 100 TB: 8 bytes per vector (32× less
    // I/O than the floats) and one xor+popcount per candidate, no
    // multiplies; survivors re-rank at full width (q_cosine_topk).
    // Map-only sketch + TakeOrdered. The oracle never packs — it
    // counts sign mismatches positionally, proving
    // popcount(xor(pack(a), pack(b))) == sign-mismatch count.
    "q_hamming_topk" -> ((s, dir) => {
      val packSql = "aggregate(sequence(0, 63), 0L, (acc, i) -> " +
        "acc + IF(element_at(embedding, i + 1) > CAST(0.0 AS FLOAT), shiftleft(1L, i), 0L))"
      val packed = Tables(s, dir).embeddings
        .select(col("vec_id"), expr(packSql).as("sk"))
      val qsk = packed.filter(col("vec_id") === 0).head().getLong(1)
      packed.select(col("vec_id"),
          bit_count(col("sk").bitwiseXOR(lit(qsk))).cast("bigint").as("hamming"))
        .orderBy(col("hamming").asc, col("vec_id").asc)
        .limit(20)
    }),

    // Reciprocal-rank fusion of two retrieval stages: for each of 4
    // query vectors, rank the whole corpus by exact cosine AND by the
    // packed-bit Hamming sketch, fuse with RRF (k=60), keep top-5 per
    // query. Both metrics come from ONE broadcast-join pass (queries
    // are a 4-row broadcast; the corpus side never shuffles to score);
    // the three windows all partition by query_id, so they ride a
    // single per-query shuffle — the standard per-query ANN partition
    // shape at cluster scale. RRF score = 1/(60+r₁) + 1/(60+r₂) over
    // integer ranks: two exact IEEE divisions and one add, identical
    // in both engines.
    "q_rrf_fusion" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      VectorExpressions.register(s)
      val d = VectorExpressions.dot _
      val packSql = "aggregate(sequence(0, 63), 0L, (acc, i) -> " +
        "acc + IF(element_at(embedding, i + 1) > CAST(0.0 AS FLOAT), shiftleft(1L, i), 0L))"
      val emb = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding"), expr(packSql).as("sk"))
      val qs = emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("sk").as("qsk"))
      val wq = Window.partitionBy(col("query_id"))
      val scored = emb.crossJoin(broadcast(qs))
        .select(col("query_id"), col("vec_id"),
          (d(col("embedding"), col("qe")) /
            (sqrt(d(col("embedding"), col("embedding"))) * sqrt(d(col("qe"), col("qe")))))
            .as("cos_sim"),
          bit_count(col("sk").bitwiseXOR(col("qsk"))).cast("bigint").as("hamming"))
        .withColumn("r_cos",
          row_number().over(wq.orderBy(col("cos_sim").desc, col("vec_id"))).cast("bigint"))
        .withColumn("r_ham",
          row_number().over(wq.orderBy(col("hamming").asc, col("vec_id"))).cast("bigint"))
        .withColumn("rrf",
          lit(1.0) / (lit(60) + col("r_cos")) + lit(1.0) / (lit(60) + col("r_ham")))
      scored
        .withColumn("rn", row_number().over(wq.orderBy(col("rrf").desc, col("vec_id"))))
        .filter(col("rn") <= 5)
        .select(col("query_id"), col("vec_id"), col("r_cos"), col("r_ham"), col("rrf"))
    }),

    // IVF assignment: nearest of 8 seed centroids (vec_id < 8) by
    // J2 — cosine LSH: 8 deterministic ±1 hyperplanes hash each
    // embedding to a sign-pattern bucket (map-only scan, no centroids
    // to train); same-bucket pairs are the ANN candidates, exactly the
    // MinHash shape but for vectors.
    "q_embed_lsh" -> ((s, dir) => {
      Tables(s, dir).embeddings.select(col("vec_id"),
        Similarity.cosineLshBucket(col("embedding"), 8, 64).as("bucket"))
    }),

    "q_embed_lsh_pairs" -> ((s, dir) => {
      val b = Tables(s, dir).embeddings.select(col("vec_id"),
        Similarity.cosineLshBucket(col("embedding"), 8, 64).as("bucket"))
      val l = b.select(col("vec_id").as("id_a"), col("bucket"))
      val r = b.select(col("vec_id").as("id_b"), col("bucket"))
      l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
        .select("bucket", "id_a", "id_b")
    }),

    // J2-ext — per-vector symmetric int8 quantization: the 4×
    // storage/bandwidth lever for an embedding corpus; floor(x+0.5)
    // rounding keeps the oracle bit-exact where round() ties differ.
    // Exploded to (vec_id, scale, pos, qval) long format: the raw
    // ArrayType(int) result is unhashable in the driver's pandas
    // comparator (round-3 red row), and the long form puts every
    // element under the oracle instead of an opaque digest.
    "q_embed_quantize" -> ((s, dir) => {
      Similarity.quantizeInt8(Tables(s, dir).embeddings, "embedding", "vec_id")
        .select(col("vec_id"), col("scale"),
          posexplode(col("qvec")).as(Seq("pos", "qval")))
        .select(col("vec_id"), col("scale"),
          col("pos").cast("bigint").as("pos"), col("qval"))
    }),

    // squared L2; broadcast centroids, per-row argmin.
    "q_ivf_assign" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.ivfAssign(emb.select(col("vec_id"), col("embedding")),
        "embedding", "vec_id", centroids, "cvec", "cid")
    }),

    // One k-means Lloyd iteration on the seeded coarse quantizer —
    // the IVF TRAINING step: map-only argmin assignment, ONE
    // (cluster, dim) aggregation for the new means, WCSS + squared
    // centroid shift riding the same single corpus scan. Exact
    // decimal sums -> hash-exact unrounded diagnostics.
    "q_kmeans_step" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      Similarity.kmeansStep(emb.select(col("vec_id"), col("embedding")),
        "embedding", "vec_id", seedCentroids(emb), "cvec", "cid")
    }),

    // IVF probe search — the ANN scale path end-to-end: map-only
    // cluster assignment, prune to the nprobe=2 clusters nearest the
    // query, cosine top-k over survivors only. Each query touches
    // ~nprobe/k of the corpus; at 100 TB cluster_id doubles as the
    // partition key so probes become partition pruning.
    "q_ivf_search" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val q = emb.filter(col("vec_id") === 0).select(col("embedding")).head()
        .getSeq[Float](0)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.ivfSearch(emb.select(col("vec_id"), col("embedding")),
        "embedding", "vec_id", centroids, "cvec", "cid", q, nprobe = 2, k = 10)
    }),

    // IVF probe search against a BUILT index: assignments persisted
    // partitionBy(cluster_id) once, probe filter prunes at the
    // directory level — the 100 TB shape (each query lists/scans only
    // nprobe/k of the corpus; no per-query re-assignment). Same oracle
    // as q_ivf_search.
    "q_ivf_search_pruned" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val q = emb.filter(col("vec_id") === 0).select(col("embedding")).head()
        .getSeq[Float](0)
      val path = ivfIndexPath(dir)
      if (!new java.io.File(s"$path/_SUCCESS").exists()) stageIvfIndex(s, dir)
      Similarity.ivfSearchPruned(s, path, "embedding", "vec_id",
        seedCentroids(emb), "cvec", "cid", q, nprobe = 2, k = 10)
    }),

    // Batch ANN: top-5 neighbors for each of 4 query vectors against
    // the built IVF index in ONE distributed join — query rows expand
    // map-side to their probe clusters, candidates come from a
    // broadcast equi-join on cluster_id (dynamic partition pruning
    // skips unprobed directories), top-k per query is a window over
    // candidates only.
    "q_ivf_knn_join" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val path = ivfIndexPath(dir)
      if (!new java.io.File(s"$path/_SUCCESS").exists()) stageIvfIndex(s, dir)
      val queries = emb.filter(col("vec_id") >= 100 && col("vec_id") < 104)
        .select(col("vec_id"), col("embedding"))
      Similarity.ivfKnnJoin(s, path, "embedding", "vec_id",
        queries, "embedding", "vec_id", seedCentroids(emb), "cvec", "cid",
        nprobe = 2, k = 5)
    }),

    // J2-eval — ANN quality read-out: recall@10 of the nprobe=2 IVF
    // search against brute-force ground truth over the same query —
    // the acceptance metric every ANN deployment tracks (probe fewer
    // clusters, trade recall for scan fraction). Pure composition of
    // the two oracle-proven searches; one row out.
    "q_ann_recall" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val q = emb.filter(col("vec_id") === 0).select(col("embedding")).head()
        .getSeq[Float](0)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val base = emb.select(col("vec_id"), col("embedding"))
      val truth = Similarity.cosineTopK(base, "embedding", "vec_id", q, 10)
        .select(col("vec_id"))
      val approx = Similarity.ivfSearch(base, "embedding", "vec_id",
          centroids, "cvec", "cid", q, nprobe = 2, k = 10)
        .select(col("vec_id"))
      truth.agg(count(lit(1)).as("k"))
        .crossJoin(broadcast(truth.join(approx, Seq("vec_id"), "left_semi")
          .agg(count(lit(1)).as("hits"))))
        .select(col("k"), col("hits"),
          round(col("hits").cast("double") / col("k").cast("double"), 6)
            .as("recall_at_10"))
    }),

    // J2-train — the COMPOSED k-means trainer: 2 Lloyd iterations from
    // the vec_id<8 seed, per-iteration map-only assignment + one
    // (cluster, dim) aggregate whose k×d means become the next round's
    // inlined centroids (driver-bounded by the IVF contract). Decimal
    // sum → double mean → float32 per coordinate keeps the trained
    // quantizer BIT-IDENTICAL to the oracle's unrolled replay.
    "q_kmeans_train" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val trained = Similarity.kmeansTrain(
        emb.select(col("vec_id"), col("embedding")),
        "embedding", "vec_id", seedCentroids(emb), "cvec", "cid",
        iterations = 2)
      trained.select(col("cid").as("cluster_id"), col("n_assigned"),
          posexplode(col("cvec")).as(Seq("i", "x")))
        .select(col("cluster_id"), col("i").cast("bigint").as("i"),
          round(col("x").cast("double"), 6).as("c"), col("n_assigned"))
    }),

    // J2-eval-2 — the ANN training loop CLOSED: recall@10 of the
    // nprobe=2 IVF search under the TRAINED quantizer vs the id-seeded
    // one, same brute-force ground truth — the before/after read-out
    // that justifies spending the training scans (trained centroids
    // tighten clusters, so the same probe budget recovers more of the
    // true top-k).
    "q_ann_recall_trained" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val base = emb.select(col("vec_id"), col("embedding"))
      val q = emb.filter(col("vec_id") === 0).select(col("embedding")).head()
        .getSeq[Float](0)
      val trained = Similarity.kmeansTrain(base, "embedding", "vec_id",
        seedCentroids(emb), "cvec", "cid", iterations = 2)
      val truth = Similarity.cosineTopK(base, "embedding", "vec_id", q, 10)
        .select(col("vec_id"))
      def hitsOf(cents: DataFrame) =
        truth.join(Similarity.ivfSearch(base, "embedding", "vec_id",
            cents, "cvec", "cid", q, nprobe = 2, k = 10).select(col("vec_id")),
          Seq("vec_id"), "left_semi").agg(count(lit(1)))
      truth.agg(count(lit(1)).as("k"))
        .crossJoin(broadcast(hitsOf(seedCentroids(emb)).toDF("hits_seed")))
        .crossJoin(broadcast(
          hitsOf(trained.select(col("cid"), col("cvec"))).toDF("hits_trained")))
        .select(col("k"), col("hits_seed"), col("hits_trained"),
          round(col("hits_seed").cast("double") / col("k").cast("double"), 6)
            .as("recall_seed"),
          round(col("hits_trained").cast("double") / col("k").cast("double"), 6)
            .as("recall_trained"))
    }),

    // J2-ext — product quantization, encode side: 64 float dims → 8
    // codes (32× smaller index). Deterministic codebooks (subvectors
    // of vec_id < 16, the IVF seed-centroid contract); encoding is a
    // map-only per-subspace argmin. Exploded to (vec_id, subspace,
    // code) rows for the oracle.
    "q_pq_encode" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val cb = Similarity.pqCodebooks(emb, "embedding", "vec_id", m = 8, k = 16)
      Similarity.pqEncode(emb.select(col("vec_id"), col("embedding")), "embedding", "vec_id", cb)
        .select(col("vec_id"), posexplode(col("codes")).as(Seq("subspace", "code")))
        .select(col("vec_id"), col("subspace").cast("bigint").as("subspace"), col("code"))
    }),

    // J2-ext — PQ ADC search: approximate top-10 for the vec_id=0
    // query by summing 8 distance-TABLE lookups per row over the CODES
    // frame — the raw embeddings are never read at query time. Terms
    // are 2^-40 fixed-point longs so the sum is order-independent and
    // oracle-exact.
    "q_pq_adc" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val cb = Similarity.pqCodebooks(emb, "embedding", "vec_id", m = 8, k = 16)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding")).head()
        .getSeq[Float](0)
      val encoded = Similarity.pqEncode(
        emb.select(col("vec_id"), col("embedding")), "embedding", "vec_id", cb)
      Similarity.pqAdcTopK(encoded, "vec_id", cb, q, topK = 10)
    }),

    // J2-ext — IVF+PQ composed (the FAISS IVFx,PQy production shape):
    // coarse cluster as the PARTITION key, PQ codes as the payload.
    // The search prunes to nprobe=2 of 8 directories AND scores from
    // table lookups — neither the unprobed clusters nor any raw
    // embedding is ever read.
    "q_ivfpq_search" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val cb = Similarity.pqCodebooks(emb, "embedding", "vec_id", m = 8, k = 16)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding")).head()
        .getSeq[Float](0)
      val path = ivfPqIndexPath(dir)
      if (!new java.io.File(s"$path/_SUCCESS").exists()) stageIvfPqIndex(s, dir)
      Similarity.ivfPqSearch(s, path, "vec_id", seedCentroids(emb), "cvec", "cid",
        cb, q, nprobe = 2, k = 10)
    }),

    // E5 — per-label centroid, exploded to (label, dim, value) rows;
    // fixed-point longs make the cross-row sum exact.
    "q_vector_centroid" -> ((s, dir) => {
      Tables(s, dir).embeddings
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim").cast("bigint").as("dim"))
        .agg((sum(Scalars.fxLong(col("v"))).cast("double") / lit(Scalars.fxScale) / count(lit(1)))
          .as("centroid"))
    }),

    // Per-dimension z-score standardization of the embedding corpus —
    // the feature-scaling pass ahead of clustering/ANN training. The
    // cross-row mean and sum-of-squares accumulate in DECIMAL over
    // 2^53 fixed-point longs (fx² ≤ 32 digits, Σ fits decimal(38,0)),
    // so partition order cannot perturb them; the final mean/std/z
    // derivation is the SAME IEEE double op sequence on both engines,
    // making raw (unrounded) z values hash-comparable. One shuffle
    // (the 64-row per-dim agg) + a broadcast join back; map-only
    // otherwise at any scale.
    "q_embed_normalize" -> ((s, dir) => {
      val ex = Tables(s, dir).embeddings
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("vec_id"), col("pos").cast("bigint").as("pos"),
          Scalars.fxLong(col("v")).as("fx"))
      val stats = ex.groupBy(col("pos")).agg(
        sum(col("fx").cast("decimal(28,0)")).as("s"),
        sum(col("fx").cast("decimal(19,0)") * col("fx").cast("decimal(19,0)"))
          .as("ss"),
        count(lit(1)).as("n"))
      val mean = col("s").cast("double") / lit(Scalars.fxScale) /
        col("n").cast("double")
      val ex2 = col("ss").cast("double") / lit(Scalars.fxScale) /
        lit(Scalars.fxScale) / col("n").cast("double")
      ex.join(broadcast(stats), Seq("pos"))
        .select(col("vec_id"), col("pos"),
          ((col("fx").cast("double") / lit(Scalars.fxScale) - mean) /
            sqrt(ex2 - mean * mean)).as("z"))
    }),

    // J2-ext — Johnson-Lindenstrauss random projection 64 -> 16 dims
    // with a SEED-DERIVED ±1 sign matrix (md5 parity of "rp_<i>_<j>"):
    // no trained matrix to store or ship — any executor (and the
    // oracle) regenerates it from the key strings. Map-only: 16 native
    // codegen'd dot kernels per row, zero shuffles at any scale. The
    // oracle re-derives the SAME signs from DuckDB's md5 and replays
    // the sequential double fold, so projections are hash-exact
    // unrounded (the q_cosine_topk parity precedent).
    "q_random_projection" -> ((s, dir) => {
      val d = VectorExpressions.dot _
      val ys = (0 until 16).map { j =>
        val signs: Seq[Float] = (0 until 64).map { i =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(s"rp_${i}_${j}".getBytes("UTF-8"))
          if (((md(0) >> 4) & 0xf) < 8) 1.0f else -1.0f
        }
        d(col("embedding"), typedlit(signs))
      }
      Tables(s, dir).embeddings
        .select(col("vec_id"), posexplode(array(ys: _*)).as(Seq("j", "y")))
        .select(col("vec_id"), col("j").cast("bigint").as("j"), col("y"))
    })
  )

  /** Shared by q_ivf_search and q_ivf_search_pruned — the built index
    * must return exactly the inline-assignment results.
    */
  private val ivfSearchSql: String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
          q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
          probes AS (
            SELECT cid FROM c, q
            ORDER BY list_sum(list_transform(range(1, len(cvec) + 1),
                       i -> (CAST(qe[i] AS DOUBLE) - CAST(cvec[i] AS DOUBLE))
                          * (CAST(qe[i] AS DOUBLE) - CAST(cvec[i] AS DOUBLE)))) ASC, cid ASC
            LIMIT 2),
          dists AS (
            SELECT e.vec_id, c.cid,
                   list_sum(list_transform(range(1, len(e.embedding) + 1),
                     i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))
                        * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)))) AS dist2
            FROM embeddings e CROSS JOIN c),
          ranked AS (
            SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
            FROM dists),
          assigned AS (SELECT vec_id, cid AS cluster_id FROM ranked WHERE rn = 1)
          SELECT e.vec_id, a.cluster_id,
                 ${dDot("e.embedding", "qe")} /
                 (sqrt(${dDot("e.embedding", "e.embedding")}) * sqrt(${dDot("qe", "qe")})) AS cos_sim
          FROM embeddings e JOIN assigned a ON e.vec_id = a.vec_id, q
          WHERE a.cluster_id IN (SELECT cid FROM probes)
          ORDER BY cos_sim DESC, e.vec_id ASC LIMIT 10"""

  /** Unrolled k-means training CTEs for DuckDB: `c0` (vec_id<8 seed)
    * → `c<iters>` trained float32 centroids, with `p<n>` carrying each
    * round's (cid, dim) decimal sums + member counts — the SAME
    * numeric contract as [[Similarity.kmeansTrain]] (decimal sum →
    * double mean → float32), so the two engines' centroids are
    * bit-identical.
    */
  private def kmeansTrainCtes(iters: Int): String = {
    val steps = (1 to iters).map { n =>
      s"""d$n AS (SELECT e.vec_id, c.cid,
               list_sum(list_transform(range(1, len(e.embedding) + 1),
                 i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))
                    * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)))) AS dist2
             FROM embeddings e CROSS JOIN c${n - 1} c),
        a$n AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
                 FROM d$n) t WHERE rn = 1),
        p$n AS (SELECT a.cid, dd.i,
                       sum(CAST(CAST(e.embedding[dd.i + 1] AS DOUBLE) AS DECIMAL(38,18))) AS sx,
                       count(*) AS nn
                FROM a$n a JOIN embeddings e USING (vec_id) CROSS JOIN dd
                GROUP BY 1, 2),
        c$n AS (SELECT c.cid,
                       list(CAST(coalesce(CAST(p.sx AS DOUBLE) / CAST(p.nn AS DOUBLE),
                                          CAST(c.cvec[dd.i + 1] AS DOUBLE)) AS FLOAT)
                            ORDER BY dd.i) AS cvec
                FROM c${n - 1} c CROSS JOIN dd
                LEFT JOIN p$n p ON p.cid = c.cid AND p.i = dd.i
                GROUP BY c.cid)"""
    }.mkString(",\n")
    s"""c0 AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
       dd AS (SELECT unnest(range(0, 64)) AS i),
       $steps"""
  }

  /** nprobe=2 / top-10 IVF search (the [[ivfSearchSql]] shape) against
    * an arbitrary centroid CTE — reused by the trained-vs-seed recall
    * oracle. Expects a CTE `q(qe)` holding the query vector.
    */
  private def ivfTop10From(cent: String): String =
    s"""SELECT e.vec_id
        FROM embeddings e
        JOIN (SELECT vec_id, cid FROM (
                SELECT dx.vec_id, dx.cid,
                       row_number() OVER (PARTITION BY dx.vec_id ORDER BY dx.dist2 ASC, dx.cid ASC) AS rn
                FROM (SELECT e2.vec_id, c.cid,
                             list_sum(list_transform(range(1, len(e2.embedding) + 1),
                               i -> (CAST(e2.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))
                                  * (CAST(e2.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)))) AS dist2
                      FROM embeddings e2 CROSS JOIN $cent c) dx) t
              WHERE rn = 1) a ON a.vec_id = e.vec_id, q
        WHERE a.cid IN (
          SELECT cid FROM $cent c3, q
          ORDER BY list_sum(list_transform(range(1, len(c3.cvec) + 1),
                     i -> (CAST(q.qe[i] AS DOUBLE) - CAST(c3.cvec[i] AS DOUBLE))
                        * (CAST(q.qe[i] AS DOUBLE) - CAST(c3.cvec[i] AS DOUBLE)))) ASC, cid ASC
          LIMIT 2)
        ORDER BY ${dDot("e.embedding", "qe")} /
                 (sqrt(${dDot("e.embedding", "e.embedding")}) * sqrt(${dDot("qe", "qe")})) DESC,
                 e.vec_id ASC
        LIMIT 10"""

  /** Unrolled cosine-LSH bucket expression for DuckDB, from the SAME
    * Scala-generated ±1 planes the Spark side uses.
    */
  private def lshBucketSql(vecExpr: String): String = {
    val pm = Similarity.lshPlanes(8, 64)
    (0 until 8).map { p =>
      val dot = (0 until 64)
        .map(d => s"CAST($vecExpr[${d + 1}] AS DOUBLE) * (${pm(p)(d)})")
        .mkString(" + ")
      s"CASE WHEN ($dot) > 0.0 THEN ${1L << p} ELSE 0 END"
    }.mkString(" + ")
  }

  /** Shared PQ oracle CTEs: deterministic codebooks (vec_id < 16),
    * per-(vector, subspace) nearest codeword — sequential list_sum
    * folds, bit-identical to the native l2sq kernel.
    */
  private val pqCodesCte: String =
    """jj AS (SELECT unnest(range(8)) AS j),
       cw AS (SELECT jj.j, e.vec_id AS c, e.embedding[jj.j*8+1 : jj.j*8+8] AS cv
              FROM embeddings e, jj WHERE e.vec_id < 16),
       sub AS (SELECT v.vec_id, jj.j, v.embedding[jj.j*8+1 : jj.j*8+8] AS sv
               FROM embeddings v, jj),
       d AS (SELECT s.vec_id, s.j, cw.c,
                    list_sum(list_transform(range(1, 9),
                      i -> (CAST(sv[i] AS DOUBLE) - CAST(cv[i] AS DOUBLE))
                         * (CAST(sv[i] AS DOUBLE) - CAST(cv[i] AS DOUBLE)))) AS d2
             FROM sub s JOIN cw ON s.j = cw.j),
       codes AS (SELECT vec_id, j, c FROM (
                   SELECT vec_id, j, c,
                          row_number() OVER (PARTITION BY vec_id, j ORDER BY d2 ASC, c ASC) AS rn
                   FROM d) WHERE rn = 1)"""

  val oracles: Map[String, String] = Map(
    "q_pq_encode" ->
      s"""WITH $pqCodesCte
          SELECT vec_id, CAST(j AS BIGINT) AS subspace, CAST(c AS INT) AS code FROM codes""",
    "q_pq_adc" ->
      s"""WITH $pqCodesCte,
          q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
          qd AS (SELECT cw.j, cw.c,
                        list_sum(list_transform(range(1, 9),
                          i -> (CAST(qe[cw.j*8+i] AS DOUBLE) - CAST(cv[i] AS DOUBLE))
                             * (CAST(qe[cw.j*8+i] AS DOUBLE) - CAST(cv[i] AS DOUBLE)))) AS d2
                 FROM cw, q),
          fx AS (SELECT codes.vec_id,
                        SUM(CAST(floor(qd.d2 * 1099511627776) AS BIGINT)) AS f
                 FROM codes JOIN qd ON codes.j = qd.j AND codes.c = qd.c
                 GROUP BY codes.vec_id)
          SELECT vec_id, CAST(f AS DOUBLE) / 1099511627776.0 AS approx_d2
          FROM fx ORDER BY approx_d2 ASC, vec_id ASC LIMIT 10""",
    "q_ivfpq_search" ->
      s"""WITH $pqCodesCte,
          c2 AS (SELECT vec_id AS cid, embedding AS cvec2 FROM embeddings WHERE vec_id < 8),
          q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
          probes AS (
            SELECT cid FROM c2, q
            ORDER BY list_sum(list_transform(range(1, len(cvec2) + 1),
                       i -> (CAST(qe[i] AS DOUBLE) - CAST(cvec2[i] AS DOUBLE))
                          * (CAST(qe[i] AS DOUBLE) - CAST(cvec2[i] AS DOUBLE)))) ASC, cid ASC
            LIMIT 2),
          adist AS (
            SELECT e.vec_id, c2.cid,
                   list_sum(list_transform(range(1, len(e.embedding) + 1),
                     i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c2.cvec2[i] AS DOUBLE))
                        * (CAST(e.embedding[i] AS DOUBLE) - CAST(c2.cvec2[i] AS DOUBLE)))) AS dist2
            FROM embeddings e CROSS JOIN c2),
          assigned AS (
            SELECT vec_id, cid AS cluster_id FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
              FROM adist) WHERE rn = 1),
          qd AS (SELECT cw.j, cw.c,
                        list_sum(list_transform(range(1, 9),
                          i -> (CAST(qe[cw.j*8+i] AS DOUBLE) - CAST(cv[i] AS DOUBLE))
                             * (CAST(qe[cw.j*8+i] AS DOUBLE) - CAST(cv[i] AS DOUBLE)))) AS d2
                 FROM cw, q),
          fx AS (SELECT codes.vec_id,
                        SUM(CAST(floor(qd.d2 * 1099511627776) AS BIGINT)) AS f
                 FROM codes
                 JOIN assigned a ON codes.vec_id = a.vec_id
                 JOIN qd ON codes.j = qd.j AND codes.c = qd.c
                 WHERE a.cluster_id IN (SELECT cid FROM probes)
                 GROUP BY codes.vec_id)
          SELECT vec_id, CAST(f AS DOUBLE) / 1099511627776.0 AS approx_d2
          FROM fx ORDER BY approx_d2 ASC, vec_id ASC LIMIT 10""",
    "q_embed_lsh" ->
      s"SELECT vec_id, CAST(${lshBucketSql("embedding")} AS BIGINT) AS bucket FROM embeddings",
    "q_embed_lsh_pairs" ->
      s"""WITH b AS (SELECT vec_id,
                CAST(${lshBucketSql("embedding")} AS BIGINT) AS bucket FROM embeddings)
          SELECT l.bucket, l.vec_id AS id_a, r.vec_id AS id_b
          FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id""",
    "q_embed_quantize" ->
      """WITH m AS (SELECT vec_id,
                list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS mx,
                unnest(list_transform(range(1, len(embedding) + 1),
                       i -> struct_pack(pos := i - 1, v := embedding[i]))) AS u
              FROM embeddings)
         SELECT vec_id, mx / 127.0 AS scale, CAST(u['pos'] AS BIGINT) AS pos,
                CASE WHEN mx = 0 THEN 0
                     ELSE CAST(floor(CAST(u['v'] AS DOUBLE) / mx * 127.0 + 0.5) AS INT)
                END AS qval
         FROM m""",
    "q_rrf_fusion" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 4),
          scored AS (
            SELECT q.query_id, e.vec_id,
                   ${dDot("e.embedding", "q.qe")} /
                   (sqrt(${dDot("e.embedding", "e.embedding")}) * sqrt(${dDot("q.qe", "q.qe")}))
                     AS cos_sim,
                   len(list_filter(range(1, 65),
                       i -> (e.embedding[i] > 0) <> (q.qe[i] > 0))) AS hamming
            FROM embeddings e CROSS JOIN q),
          ranked AS (
            SELECT query_id, vec_id,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS r_cos,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY hamming, vec_id) AS BIGINT) AS r_ham
            FROM scored)
          SELECT query_id, vec_id, r_cos, r_ham,
                 1.0/(60+r_cos) + 1.0/(60+r_ham) AS rrf
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY 1.0/(60+r_cos)+1.0/(60+r_ham) DESC, vec_id) AS rn
                FROM ranked) t
          WHERE rn <= 5""",
    "q_hamming_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         SELECT vec_id,
                CAST(len(list_filter(range(1, 65),
                         i -> (embedding[i] > 0) <> (qe[i] > 0))) AS BIGINT) AS hamming
         FROM embeddings, q
         ORDER BY hamming, vec_id LIMIT 20""",
    "q_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
          SELECT vec_id,
                 ${dDot("embedding", "qe")} /
                 (sqrt(${dDot("embedding", "embedding")}) * sqrt(${dDot("qe", "qe")})) AS cos_sim
          FROM embeddings, q
          ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""",
    "q_embed_truncate" ->
      s"""WITH q AS (SELECT embedding[1:16] AS qe FROM embeddings WHERE vec_id = 0),
          e AS (SELECT vec_id, embedding[1:16] AS te FROM embeddings)
          SELECT vec_id,
                 ${dDot("te", "qe")} /
                 (sqrt(${dDot("te", "te")}) * sqrt(${dDot("qe", "qe")})) AS cos_sim
          FROM e, q
          ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""",
    "q_two_stage_rerank" ->
      s"""WITH q AS (SELECT embedding AS qf, embedding[1:16] AS q16
                     FROM embeddings WHERE vec_id = 0),
          e AS (SELECT vec_id, embedding, embedding[1:16] AS te FROM embeddings),
          cand AS (SELECT vec_id, embedding
                   FROM e, q
                   ORDER BY ${dDot("te", "q16")} /
                            (sqrt(${dDot("te", "te")}) * sqrt(${dDot("q16", "q16")})) DESC,
                            vec_id ASC
                   LIMIT 50)
          SELECT vec_id,
                 ${dDot("embedding", "qf")} /
                 (sqrt(${dDot("embedding", "embedding")}) * sqrt(${dDot("qf", "qf")})) AS cos_sim
          FROM cand, q
          ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""",
    "q_ivf_assign" ->
      """WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
          dists AS (
            SELECT e.vec_id, c.cid,
                   list_sum(list_transform(range(1, len(e.embedding) + 1),
                     i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))
                        * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)))) AS dist2
            FROM embeddings e CROSS JOIN c),
          ranked AS (
            SELECT vec_id, cid, dist2,
                   row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
            FROM dists)
          SELECT vec_id, cid AS cluster_id, dist2 FROM ranked WHERE rn = 1""",
    "q_kmeans_step" ->
      """WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
          dists AS (
            SELECT e.vec_id, c.cid,
                   list_sum(list_transform(range(1, len(e.embedding) + 1),
                     i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))
                        * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)))) AS dist2
            FROM embeddings e CROSS JOIN c),
          ranked AS (
            SELECT vec_id, cid, dist2,
                   row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
            FROM dists),
          a AS (SELECT vec_id, cid AS cluster_id, dist2 FROM ranked WHERE rn = 1),
          ex AS (SELECT a.cluster_id, a.dist2, ii.i,
                        CAST(e.embedding[ii.i + 1] AS DOUBLE) AS x
                 FROM a JOIN embeddings e USING (vec_id)
                 CROSS JOIN (SELECT unnest(range(0, 64)) AS i) ii),
          per AS (SELECT cluster_id, i,
                         sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(38,18))) AS sx,
                         count(*) AS nn,
                         sum(CAST(dist2 AS DECIMAL(38,18))) AS sd
                  FROM ex GROUP BY 1, 2),
          m AS (SELECT per.*, CAST(sx AS DOUBLE) / CAST(nn AS DOUBLE) AS m,
                       CAST(c.cvec[per.i + 1] AS DOUBLE) AS oc
                FROM per JOIN c ON c.cid = per.cluster_id)
          SELECT cluster_id, max(nn) AS n_assigned,
                 round(CAST(max(sd) AS DOUBLE), 6) AS wcss,
                 round(CAST(sum(CAST((m - oc) * (m - oc) AS DECIMAL(38,18)))
                            AS DOUBLE), 6) AS shift2
          FROM m GROUP BY cluster_id""",
    "q_ivf_search" -> ivfSearchSql,
    "q_ivf_search_pruned" -> ivfSearchSql,
    "q_ann_recall" ->
      s"""WITH truth AS (
            SELECT vec_id FROM embeddings,
                 (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
            ORDER BY ${dDot("embedding", "qe")} /
                     (sqrt(${dDot("embedding", "embedding")}) * sqrt(${dDot("qe", "qe")})) DESC,
                     vec_id ASC
            LIMIT 10),
          approx AS (SELECT vec_id FROM ($ivfSearchSql)),
          k AS (SELECT count(*) AS k FROM truth),
          h AS (SELECT count(*) AS hits FROM truth
                WHERE vec_id IN (SELECT vec_id FROM approx))
         SELECT k, hits,
                round(CAST(hits AS DOUBLE) / CAST(k AS DOUBLE), 6) AS recall_at_10
         FROM k, h""",
    "q_kmeans_train" ->
      s"""WITH ${kmeansTrainCtes(2)}
          SELECT c.cid AS cluster_id, dd.i AS i,
                 round(CAST(c.cvec[dd.i + 1] AS DOUBLE), 6) AS c,
                 coalesce(n.nn, 0) AS n_assigned
          FROM c2 c CROSS JOIN dd
          LEFT JOIN (SELECT cid, max(nn) AS nn FROM p2 GROUP BY 1) n
            ON n.cid = c.cid""",
    "q_ann_recall_trained" ->
      s"""WITH ${kmeansTrainCtes(2)},
          q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
          truth AS (
            SELECT vec_id FROM embeddings, q
            ORDER BY ${dDot("embedding", "qe")} /
                     (sqrt(${dDot("embedding", "embedding")}) * sqrt(${dDot("qe", "qe")})) DESC,
                     vec_id ASC
            LIMIT 10),
          k AS (SELECT count(*) AS k FROM truth),
          hs AS (SELECT count(*) AS hits_seed FROM truth
                 WHERE vec_id IN (${ivfTop10From("c0")})),
          ht AS (SELECT count(*) AS hits_trained FROM truth
                 WHERE vec_id IN (${ivfTop10From("c2")}))
          SELECT k, hits_seed, hits_trained,
                 round(CAST(hits_seed AS DOUBLE) / CAST(k AS DOUBLE), 6) AS recall_seed,
                 round(CAST(hits_trained AS DOUBLE) / CAST(k AS DOUBLE), 6) AS recall_trained
          FROM k, hs, ht""",
    "q_ivf_knn_join" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
          q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
                WHERE vec_id >= 100 AND vec_id < 104),
          dists AS (
            SELECT e.vec_id, c.cid,
                   list_sum(list_transform(range(1, len(e.embedding) + 1),
                     i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))
                        * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)))) AS dist2
            FROM embeddings e CROSS JOIN c),
          ranked AS (
            SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
            FROM dists),
          assigned AS (SELECT vec_id, cid AS cluster_id FROM ranked WHERE rn = 1),
          qd AS (
            SELECT q.q_id, c.cid,
                   list_sum(list_transform(range(1, len(q.qe) + 1),
                     i -> (CAST(q.qe[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))
                        * (CAST(q.qe[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)))) AS dist2
            FROM q CROSS JOIN c),
          qr AS (
            SELECT q_id, cid, row_number() OVER (PARTITION BY q_id ORDER BY dist2 ASC, cid ASC) AS rn
            FROM qd),
          probes AS (SELECT q_id, cid FROM qr WHERE rn <= 2),
          cands AS (
            SELECT p.q_id, e.vec_id,
                   ${dDot("e.embedding", "q.qe")} /
                   (sqrt(${dDot("e.embedding", "e.embedding")}) * sqrt(${dDot("q.qe", "q.qe")})) AS cos_sim
            FROM probes p
            JOIN assigned a ON a.cluster_id = p.cid
            JOIN embeddings e ON e.vec_id = a.vec_id
            JOIN q ON q.q_id = p.q_id),
          sel AS (
            SELECT q_id, vec_id, cos_sim,
                   row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rn
            FROM cands)
          SELECT q_id, vec_id, cos_sim FROM sel WHERE rn <= 5""",
    "q_vector_centroid" ->
      """SELECT label, CAST(u['dim'] AS BIGINT) AS dim,
                CAST(CAST(sum(CAST(CAST(u['v'] AS DOUBLE) * 9007199254740992 AS BIGINT)) AS DOUBLE)
                  / 9007199254740992 / count(*) AS DOUBLE) AS centroid
         FROM (SELECT label,
                      unnest(list_transform(range(1, len(embedding) + 1),
                             i -> struct_pack(dim := i - 1, v := embedding[i]))) AS u
               FROM embeddings)
         GROUP BY label, dim""",
    "q_embed_normalize" ->
      """WITH ex AS (SELECT vec_id, CAST(u['pos'] AS BIGINT) AS pos,
                            CAST(CAST(u['v'] AS DOUBLE) * 9007199254740992 AS BIGINT) AS fx
                     FROM (SELECT vec_id,
                                  unnest(list_transform(range(1, len(embedding) + 1),
                                         i -> struct_pack(pos := i - 1, v := embedding[i]))) AS u
                           FROM embeddings)),
          st AS (SELECT pos, sum(fx) AS s,
                        sum(CAST(fx AS HUGEINT) * CAST(fx AS HUGEINT)) AS ss,
                        count(*) AS n
                 FROM ex GROUP BY 1)
         SELECT vec_id, pos,
                CAST((CAST(fx AS DOUBLE) / 9007199254740992.0
                      - (CAST(s AS DOUBLE) / 9007199254740992.0 / CAST(n AS DOUBLE)))
                 / sqrt(CAST(ss AS DOUBLE) / 9007199254740992.0 / 9007199254740992.0
                          / CAST(n AS DOUBLE)
                        - (CAST(s AS DOUBLE) / 9007199254740992.0 / CAST(n AS DOUBLE))
                          * (CAST(s AS DOUBLE) / 9007199254740992.0 / CAST(n AS DOUBLE)))
                 AS DOUBLE) AS z
         FROM ex JOIN st USING (pos)""",
    "q_random_projection" ->
      """WITH sg AS (SELECT i.range AS i, j.range AS j,
                 CASE WHEN substr(md5('rp_' || i.range || '_' || j.range), 1, 1)
                           BETWEEN '0' AND '7'
                      THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS sgn
               FROM range(64) i, range(16) j),
          s AS (SELECT j, list(sgn ORDER BY i) AS sv FROM sg GROUP BY j)
          SELECT vec_id, CAST(j AS BIGINT) AS j,
                 list_sum(list_transform(range(1, 65),
                   i -> CAST(embedding[i] AS DOUBLE) * sv[i])) AS y
          FROM embeddings, s"""
  )
}
