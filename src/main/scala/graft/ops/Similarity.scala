package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) —
  * SURVEY.md §2.J (J2) / north star ANN.
  *
  * Float elements widen to double (exact) before any arithmetic;
  * per-vector folds run in array order, so scores are bit-deterministic
  * at any parallelism. Two search paths:
  *  - brute-force cosine top-k against a broadcast query vector: one
  *    scan, no shuffle except the final TakeOrdered — the correctness
  *    baseline, and fine whenever the query set is small;
  *  - IVF-style partitioning: assign vectors to the nearest of k
  *    centroids, then search only within the probe's cluster(s). At
  *    100 TB the assignment is one scan and subsequent queries touch
  *    1/k of the data; cluster id is also the natural bucketing key
  *    for a co-located self-join.
  */
object Similarity {

  /** Exact dot product of two double-castable array columns — a
    * sequential fold over zip_with (bit-identical to DuckDB list_sum
    * of the element-wise products).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Adds a unit-normalized double copy of `vecCol`. Pair-similarity
    * jobs normalize ONCE per vector so each candidate pair costs a
    * single dot fold instead of dot + two norms — HOF folds run
    * interpreted per element, so at millions of pairs this is the
    * difference between seconds and minutes. The norm lands in its own
    * column first so the transform lambda doesn't re-fold it per
    * element.
    */
  def withNormalized(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn("__norm", norm(col(vecCol)))
      .withColumn(outCol, transform(col(vecCol), x => x.cast("double") / col("__norm")))
      .drop("__norm")

  /** Deterministic ±1 hyperplane components for cosine LSH: the sign
    * of an md5 of (plane, dim) — reproducible anywhere, no RNG state,
    * and embeddable verbatim in the DuckDB oracle.
    */
  def lshPlanes(planes: Int, dims: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dims) { (p, d) =>
      val h = md.digest(s"$p|$d".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }
  }

  /** Random-hyperplane (cosine) LSH bucket of an embedding: bit p is
    * the sign of the dot product with the p-th ±1 plane, so vectors
    * within a small angle share buckets with high probability — the
    * LSH-bucketed ANN family next to IVF (SURVEY §2.J J2): no
    * training/centroids, one map-only scan, candidates meet in a
    * bucket equi-join exactly like the text MinHash path. The per-row
    * fold is a fixed left-to-right double sum, bit-identical to the
    * oracle's unrolled expression.
    */
  def cosineLshBucket(vec: Column, planes: Int, dims: Int): Column = {
    val pm = lshPlanes(planes, dims)
    (0 until planes).map { p =>
      val dot = (0 until dims).map { d =>
        element_at(vec, d + 1).cast("double") * lit(pm(p)(d))
      }.reduce(_ + _)
      when(dot > 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Symmetric int8 quantization of an embedding column: each vector
    * is scaled by its own max-|v| to [-127, 127] and rounded half-up
    * via floor(x + 0.5) — floor is bit-identical across engines where
    * round() tie-breaking is not. 4× smaller vectors are the standard
    * storage/bandwidth lever for a 100 TB embedding corpus; dequantize
    * with the per-vector `scale` column this emits alongside. Zero
    * vectors quantize to zeros with scale 0.
    */
  def quantizeInt8(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val mx = array_max(transform(col(vecCol), v => abs(v.cast("double"))))
    df.withColumn("__mx", mx)
      .select(col(idCol), (col("__mx") / 127.0).as("scale"),
        when(col("__mx") === 0.0,
          transform(col(vecCol), _ => lit(0)))
          .otherwise(transform(col(vecCol),
            v => floor(v.cast("double") / col("__mx") * 127.0 + 0.5).cast("int")))
          .as("qvec"))
  }

  /** Brute-force cosine top-k of `df.vecCol` against one query vector
    * (as a literal array column, e.g. from a collected row — small,
    * broadcast with the plan). Catalyst plans TakeOrderedAndProject:
    * k rows per partition, merged on the driver.
    */
  def cosineTopK(df: DataFrame, vecCol: String, idCol: String, queryVec: Column, k: Int): DataFrame =
    df.select(col(idCol), cosine(col(vecCol), queryVec).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)

  /** Overload for a driver-held query vector: the query norm is folded
    * on the driver (same sequential square-sum the column fold runs, so
    * bit-identical) and inlined as a literal — the per-row work is one
    * dot + one norm instead of dot + two norms, with no reliance on
    * Catalyst constant-folding through the HOF lambda.
    */
  def cosineTopK(df: DataFrame, vecCol: String, idCol: String, queryVec: Seq[Float], k: Int): DataFrame = {
    var acc = 0.0
    var i = 0
    while (i < queryVec.length) { val x = queryVec(i).toDouble; acc += x * x; i += 1 }
    val qv = typedlit(queryVec)
    df.select(col(idCol), (dot(col(vecCol), qv) / (norm(col(vecCol)) * lit(math.sqrt(acc))))
        .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF assignment: nearest (squared-L2) centroid per vector,
    * deterministic tie-break on centroid id. The centroid set is
    * collected to the driver (IVF's contract: k centroids, k small)
    * and inlined as a literal array, so assignment is MAP-ONLY — a
    * per-row argmin with zero joins and zero shuffles. The round-1
    * form cross-joined k rows per vector and ranked them with a
    * window, which shuffled k×N rows for nothing; at 100 TB this
    * version is one scan, which is what makes IVF the ANN scale path.
    * Distances use the native [[graft.expressions.FloatVectorL2Sq]]
    * sequential fold — bit-identical to the DuckDB oracle's list_sum.
    */
  private def collectCentroids(centroids: DataFrame, cVecCol: String, cIdCol: String): Seq[(Long, Seq[Float])] =
    centroids.select(col(cIdCol).cast("long"), col(cVecCol))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .sortBy(_._1)

  /** argmin struct(dist2, cid) over the centroid set, via the native
    * [[graft.expressions.CentroidArgminL2]] kernel: centroids ride as
    * a per-stage reference object (broadcast with the task binary),
    * NOT a plan-inlined literal — at k=√N ≈ 2.5k centroids × d the old
    * `typedlit` form put O(k·d) into every treeString / codegen source
    * / stage serialization and churned k structs per row; the kernel
    * is O(1) plan size and one allocation-free loop (VERDICT r12
    * item 4). Byte-identical to [[assignExprLiteral]] — same
    * [[graft.expressions.FloatVectorL2Sq]] fold, same (dist2, cid)
    * tie-break — pinned in ExpressionsSpec; plan-size and no-shuffle
    * asserted in PlanShapeSpec.
    */
  private def assignExpr(vecCol: String, cents: Seq[(Long, Seq[Float])]): Column =
    graft.expressions.VectorExpressions.centroidArgmin(col(vecCol), cents)

  /** The displaced literal composition — array_min's struct ordering ==
    * (dist2 asc, cid asc) tie-break. Kept as the declarative semantic
    * reference the native kernel is spec-pinned against (and the shape
    * the DuckDB oracle mirrors).
    */
  private[graft] def assignExprLiteral(vecCol: String, cents: Seq[(Long, Seq[Float])]): Column =
    array_min(transform(typedlit(cents), c =>
      struct(
        graft.expressions.VectorExpressions.l2sq(col(vecCol), c.getField("_2")).as("dist2"),
        c.getField("_1").as("cid"))))

  def ivfAssign(df: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String): DataFrame = {
    val cents = collectCentroids(centroids, cVecCol, cIdCol)
    df.withColumn("__best", assignExpr(vecCol, cents))
      .select(col(idCol), col("__best.cid").as("cluster_id"), col("__best.dist2").as("dist2"))
  }

  /** [[ivfAssign]] keeping every input column (r13, guide §2.4): the
    * assignment is a per-row argmin, so a consumer that needs the
    * vector NEXT TO its cluster_id — every IVF pair generator — gets
    * it from the same map-only scan. The former shape projected the
    * assignment to (id, cluster_id) and joined it back to the corpus
    * on id, which re-scanned the vector table and (past the broadcast
    * threshold) shuffled the payload by a key it is never used under.
    * Row set and values are identical by construction (the join was
    * 1:1 on the unique id).
    */
  def ivfAssignWith(df: DataFrame, vecCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String): DataFrame = {
    val cents = collectCentroids(centroids, cVecCol, cIdCol)
    df.withColumn("cluster_id", assignExpr(vecCol, cents).getField("cid"))
  }

  /** IVF probe search: brute-force top-k restricted to the `nprobe`
    * clusters nearest the query vector — the standard recall/cost
    * trade: each query touches ~nprobe/k of the corpus instead of all
    * of it. Assignment is the map-only [[ivfAssign]]; the probe-cluster
    * filter prunes before any per-vector scoring.
    */
  /** Nearest-`nprobe` centroid ids to a driver-held query vector —
    * driver-side by the same contract as [[collectCentroids]] (k
    * centroids, k small).
    */
  private def probeClusters(cents: Seq[(Long, Seq[Float])], queryVec: Seq[Float], nprobe: Int): Seq[Long] =
    cents
      .map { case (cid, c) =>
        var acc = 0.0; var i = 0
        val n = math.min(c.length, queryVec.length)
        while (i < n) { val d = queryVec(i).toDouble - c(i).toDouble; acc += d * d; i += 1 }
        (cid, acc)
      }
      .sortBy { case (cid, d2) => (d2, cid) }
      .take(nprobe).map(_._1)

  def ivfSearch(df: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String,
      queryVec: Seq[Float], nprobe: Int, k: Int): DataFrame = {
    val cents = collectCentroids(centroids, cVecCol, cIdCol)
    val probes = probeClusters(cents, queryVec, nprobe)
    val qv = typedlit(queryVec)
    // One pass: assign, prune to probe clusters, score survivors, top-k
    // (TakeOrderedAndProject) — no joins, no shuffles before the final
    // k-row merge.
    val d = graft.expressions.VectorExpressions.dot _
    df.withColumn("cluster_id", assignExpr(vecCol, cents).getField("cid"))
      .filter(col("cluster_id").isin(probes: _*))
      .select(col(idCol), col("cluster_id"),
        (d(col(vecCol), qv) / (sqrt(d(col(vecCol), col(vecCol))) * sqrt(d(qv, qv))))
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF index BUILD: assign every corpus vector to its nearest
    * centroid once ([[ivfAssign]] semantics, map-only) and persist the
    * result `partitionBy(cluster_id)`. This is the piece that makes
    * probe search actually touch ~nprobe/k of the data at 100 TB:
    * [[ivfSearch]] re-derives the assignment inline, so every query is
    * a full-corpus scan + k-centroid argmin per row; with the
    * assignment stored as the partition key, the probe filter becomes
    * DIRECTORY pruning — non-probe clusters are never even listed into
    * the scan (asserted in `PlanShapeSpec`). Build cost is one scan +
    * one write, amortized over every subsequent query; rebuild only on
    * centroid refresh (dynamic partition overwrite keeps it
    * idempotent).
    */
  def ivfBuild(df: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String, path: String): Unit = {
    val cents = collectCentroids(centroids, cVecCol, cIdCol)
    val assigned = df
      .withColumn("cluster_id", assignExpr(vecCol, cents).getField("cid"))
      .select(col(idCol), col(vecCol), col("cluster_id"))
    graft.io.PartitionedWriter.writePartitionedBy(assigned, path, Seq("cluster_id"))
  }

  /** IVF probe search against a built index ([[ivfBuild]] output):
    * pick the nprobe nearest centroids on the driver, read ONLY those
    * `cluster_id=` partitions (partition pruning — the scan never
    * lists the rest), score survivors, top-k. Same results as
    * [[ivfSearch]] on the same centroid set; the full-corpus scan and
    * the per-row k-centroid argmin are both gone.
    */
  def ivfSearchPruned(spark: org.apache.spark.sql.SparkSession, path: String,
      vecCol: String, idCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String,
      queryVec: Seq[Float], nprobe: Int, k: Int): DataFrame = {
    val cents = collectCentroids(centroids, cVecCol, cIdCol)
    val probes = probeClusters(cents, queryVec, nprobe)
    val qv = typedlit(queryVec)
    val d = graft.expressions.VectorExpressions.dot _
    // Partition values are strings on disk (type inference off, see
    // GraftSession): filter on the string form so the IN lands in
    // PartitionFilters verbatim; cast back for the result schema.
    spark.read.parquet(path)
      .filter(col("cluster_id").isin(probes.map(_.toString): _*))
      .select(col(idCol), col("cluster_id").cast("long").as("cluster_id"),
        (d(col(vecCol), qv) / (sqrt(d(col(vecCol), col(vecCol))) * sqrt(d(qv, qv))))
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batch ANN — top-k neighbors for EVERY row of `queries` against a
    * built IVF index ([[ivfBuild]] output): the nearest-neighbor JOIN
    * shape training pipelines actually run (retrieval, embedding
    * dedupe), where looping [[ivfSearchPruned]] per query would be a
    * driver-side loop. Fully distributed:
    *  - each query row expands map-side to its `nprobe` nearest
    *    clusters (argmin over the same inlined centroid array the
    *    assignment uses — no join, no shuffle);
    *  - candidates come from an equi-join on `cluster_id`; the query
    *    side is broadcast, so the big index side never shuffles AND
    *    Spark's dynamic partition pruning can skip unprobed
    *    `cluster_id=` directories at runtime (the batch analogue of
    *    the static IN-filter prune, asserted in `PlanShapeSpec`);
    *  - top-k per query is one window over candidates only
    *    (≈ nprobe/k of the corpus per query, not the corpus).
    */
  def ivfKnnJoin(spark: org.apache.spark.sql.SparkSession, indexPath: String,
      vecCol: String, idCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String,
      nprobe: Int, k: Int): DataFrame = {
    val cents = collectCentroids(centroids, cVecCol, cIdCol)
    val l2 = graft.expressions.VectorExpressions.l2sq _
    val d = graft.expressions.VectorExpressions.dot _
    // per-query probe clusters: sort (dist2, cid) structs, keep nprobe
    val probeArr = slice(
      array_sort(transform(typedlit(cents), c =>
        struct(l2(col(qVecCol), c.getField("_2")).as("d2"), c.getField("_1").as("cid")))),
      1, nprobe)
    val expanded = queries
      .select(col(qIdCol).as("q_id"), col(qVecCol).as("__qvec"),
        explode(probeArr.getField("cid")).as("__probe"))
      .withColumn("__qnorm", sqrt(d(col("__qvec"), col("__qvec"))))
    val index = spark.read.parquet(indexPath)
    val scored = index
      .join(broadcast(expanded), index("cluster_id") === expanded("__probe").cast("string"))
      .select(col("q_id"), col(idCol),
        (d(col(vecCol), col("__qvec")) /
          (sqrt(d(col(vecCol), col(vecCol))) * col("__qnorm"))).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col(idCol).asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Product quantization (Jégou et al. 2011) — the ANN family that
    * COMPRESSES the index: each vector becomes `m` small codes (one
    * byte-sized code per subspace), 64 float dims → 8 codes ≈ 32×
    * smaller, and queries scan codes with a per-query distance TABLE
    * instead of touching raw vectors. Deterministic "training" by the
    * same contract as IVF's seed centroids: subspace j's codebook is
    * the j-th subvector of the first `k` corpus vectors (id < k) —
    * reproducible anywhere, embeddable in the DuckDB oracle.
    *
    * Scale shape: codebooks are m×k subvectors, driver-sized by
    * contract (the [[collectCentroids]] precedent); encoding is a
    * MAP-ONLY argmin per subspace (zero joins/shuffles — the ivfAssign
    * shape, once per subspace); ADC search is a map-only scan of the
    * CODES table summing m table lookups per row, never reading the
    * raw embedding.
    *
    * Determinism note: ADC sums m per-subspace doubles; to keep the
    * total independent of addition order (and bit-identical to the
    * oracle's SUM over join rows), each term is floored to 2^-40
    * fixed-point and summed in LONGS, exact in any order.
    */
  private val pqFx = 1099511627776L // 2^40

  /** Codebooks[j][c] = subvector j of training vector c (id < k). */
  def pqCodebooks(df: DataFrame, vecCol: String, idCol: String,
      m: Int, k: Int): Array[Array[Seq[Float]]] = {
    val train = df.filter(col(idCol) < k)
      .select(col(idCol).cast("long"), col(vecCol))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    require(train.length == k, s"need the $k training vectors id<$k, got ${train.length}")
    val d = train.head._2.length / m
    Array.tabulate(m, k)((j, c) => train(c)._2.slice(j * d, (j + 1) * d))
  }

  /** array<int> codes column: per-subspace nearest-codeword argmin —
    * native l2sq per candidate, ties to the lower code. The codebook
    * is a LITERAL array folded by one `transform` per subspace (the
    * [[assignExpr]] shape) — unrolling k×m inline argmin structs
    * generates past the JVM's 64 KB method limit and kicks the whole
    * stage out of codegen.
    */
  private def pqCodesExpr(vecCol: String, codebooks: Array[Array[Seq[Float]]]): Column = {
    val m = codebooks.length
    val d = codebooks(0)(0).length
    val l2 = graft.expressions.VectorExpressions.l2sq _
    array((0 until m).map { j =>
      val sub = slice(col(vecCol), j * d + 1, d)
      val cands: Seq[(Int, Seq[Float])] = codebooks(j).zipWithIndex.map { case (cw, c) => (c, cw) }
      array_min(transform(typedlit(cands), t =>
        struct(l2(sub, t.getField("_2")).as("d2"), t.getField("_1").as("c"))))
        .getField("c")
    }: _*)
  }

  /** (id, codes array<int>) — map-only, see [[pqCodesExpr]]. */
  def pqEncode(df: DataFrame, vecCol: String, idCol: String,
      codebooks: Array[Array[Seq[Float]]]): DataFrame =
    df.select(col(idCol), pqCodesExpr(vecCol, codebooks).as("codes"))

  /** Driver-side per-query distance table dt[j][c] — the same
    * sequential double fold the native kernel runs (bit-identical).
    */
  def pqDistTable(codebooks: Array[Array[Seq[Float]]], queryVec: Seq[Float]): Array[Array[Double]] = {
    val m = codebooks.length
    val d = codebooks(0)(0).length
    Array.tabulate(m, codebooks(0).length) { (j, c) =>
      var acc = 0.0
      var i = 0
      while (i < d) {
        val diff = queryVec(j * d + i).toDouble - codebooks(j)(c)(i).toDouble
        acc += diff * diff
        i += 1
      }
      acc
    }
  }

  /** Approximate top-k by ADC over an encoded frame: m fixed-point
    * table lookups + a long sum per row, TakeOrdered for the top-k.
    */
  def pqAdcTopK(encoded: DataFrame, idCol: String,
      codebooks: Array[Array[Seq[Float]]], queryVec: Seq[Float], topK: Int): DataFrame = {
    val dt = pqDistTable(codebooks, queryVec)
    val terms = dt.indices.map { j =>
      val fx = dt(j).map(v => math.floor(v * pqFx).toLong).toSeq
      element_at(typedlit(fx), element_at(col("codes"), j + 1) + 1)
    }
    encoded.select(col(idCol),
      (terms.reduce(_ + _).cast("double") / lit(pqFx.toDouble)).as("approx_d2"))
      .orderBy(col("approx_d2").asc, col(idCol).asc)
      .limit(topK)
  }

  /** IVF+PQ — the composed production ANN index (the FAISS `IVFx,PQy`
    * shape): coarse IVF assignment is the PARTITION key, PQ codes are
    * the PAYLOAD. A query then (a) prunes to nprobe directories
    * without listing the rest, and (b) scores survivors from m
    * distance-table lookups per row — so at 100 TB a query touches
    * ~nprobe/k of a corpus that is itself ~32× smaller than the raw
    * vectors, and never reads an embedding. Build is one scan (both
    * the assignment argmin and the per-subspace encode are map-only)
    * plus the partitioned write.
    */
  def ivfPqBuild(df: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String,
      codebooks: Array[Array[Seq[Float]]], path: String): Unit = {
    val cents = collectCentroids(centroids, cVecCol, cIdCol)
    // ONE map-only projection computes both the coarse assignment and
    // the codes — no self-join, one pass over the corpus
    graft.io.PartitionedWriter.writePartitionedBy(
      df.select(col(idCol), pqCodesExpr(vecCol, codebooks).as("codes"),
        assignExpr(vecCol, cents).getField("cid").as("cluster_id")),
      path, Seq("cluster_id"))
  }

  /** ADC search over a built IVF+PQ index: driver-side probe pick,
    * directory-pruned scan of (id, codes), fixed-point table-lookup
    * scoring, top-k. No raw vector is read at query time.
    */
  def ivfPqSearch(spark: org.apache.spark.sql.SparkSession, path: String, idCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String,
      codebooks: Array[Array[Seq[Float]]],
      queryVec: Seq[Float], nprobe: Int, k: Int): DataFrame = {
    val cents = collectCentroids(centroids, cVecCol, cIdCol)
    val probes = probeClusters(cents, queryVec, nprobe)
    val pruned = spark.read.parquet(path)
      .filter(col("cluster_id").isin(probes.map(_.toString): _*))
    pqAdcTopK(pruned, idCol, codebooks, queryVec, k)
  }

  /** J2-ext — SemDeDup-style SEMANTIC deduplication: two documents are
    * duplicates when their embeddings are τ-close in cosine, and the
    * corpus keeps one representative per near-dup neighborhood.
    * Composition of the proven scale pieces:
    *  - candidate pairs form ONLY inside an IVF cluster (map-only
    *    [[ivfAssign]] + equi-join on `cluster_id` — never all-pairs);
    *  - vectors are normalized once ([[withNormalized]]) so each pair
    *    costs a single native dot fold;
    *  - keep policy is greedy smallest-id: a document is dropped iff
    *    some SMALLER id in its cluster is τ-close. Deterministic, one
    *    pass, no transitive chaining — a chained near-dup that slips
    *    through is caught on the next index rebuild, the standard
    *    production trade (SemDeDup itself dedups per-cluster only).
    * The drop set ships ids only; the final anti-join shuffles ids,
    * never vectors or text.
    */
  def semanticDedup(df: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String, tau: Double): DataFrame = {
    graft.expressions.VectorExpressions.register(df.sparkSession)
    // keep-columns assignment (r13): cluster_id lands NEXT TO the
    // vector in one map-only scan — no (id, cluster_id) ⋈ corpus
    // join-back (same rows: that join was 1:1 on the unique id)
    val assigned = ivfAssignWith(df.select(col(idCol), col(vecCol)),
      vecCol, centroids, cVecCol, cIdCol)
    val normed = withNormalized(assigned, vecCol, "__ne")
      .select(col("cluster_id"), col(idCol), col("__ne"))
    val a = normed.select(col("cluster_id"), col(idCol).as("__id_a"), col("__ne").as("__na"))
    val b = normed.select(col("cluster_id"), col(idCol).as("__id_b"), col("__ne").as("__nb"))
    val drops = a.join(b, Seq("cluster_id"))
      .filter(col("__id_a") < col("__id_b"))
      .filter(graft.expressions.VectorExpressions.dot(col("__na"), col("__nb")) >= tau)
      .select(col("__id_b").as(idCol)).distinct()
    df.select(col(idCol)).join(drops, Seq(idCol), "left_anti")
  }

  /** E5 — typed Aggregator: element-wise mean of embedding vectors
    * (cluster centroid). Buffer is (sums, count); merge is element-wise.
    * Exposed via `udaf` for DataFrame use; unit-tested (float summation
    * order across partitions makes it oracle-exempt by design —
    * SURVEY §7.3).
    */
  class CentroidAggregator(dims: Int)
      extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {
    def zero: (Array[Double], Long) = (Array.fill(dims)(0.0), 0L)
    def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
      var i = 0
      while (i < dims && i < v.length) { b._1(i) += v(i); i += 1 }
      (b._1, b._2 + 1)
    }
    def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dims) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
    def finish(r: (Array[Double], Long)): Seq[Double] =
      if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq
    def bufferEncoder = Encoders.tuple(Encoders.kryo[Array[Double]], Encoders.scalaLong)
    def outputEncoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** One k-means Lloyd iteration over the coarse quantizer — the
    * TRAINING step behind the IVF family ([[ivfAssign]] consumes the
    * centroids an iterated version of this produces). Assignment is
    * the map-only inlined-centroid argmin (zero joins, zero shuffles
    * over the corpus — [[ivfAssign]]'s kernel); ONE (cluster, dim)
    * aggregation then recomputes every centroid coordinate as the
    * decimal-exact mean of its members, so the corpus is scanned
    * EXACTLY ONCE (the within-cluster sum of squares rides the same
    * exploded frame instead of a second pass).
    *
    * Returns per-cluster step diagnostics — member count, WCSS (the
    * k-means objective), and squared centroid shift (the convergence
    * signal a training loop watches) — as decimal sums rounded to 6
    * decimals: double→decimal conversion rounds differently in the
    * last ulp across engines (Spark goes through the shortest-repr
    * BigDecimal, DuckDB through the exact binary expansion), so the
    * raw 18-digit sums differ ~1e-16 relative; round(…, 6) is the
    * [[graft.ops.Graph.pageRank]] oracle contract for exactly this.
    * The old centroid coordinates ride in as a driver-built k×d frame
    * (bounded by the IVF contract: k small, d fixed).
    */
  def kmeansStep(df: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = collectCentroids(centroids, cVecCol, cIdCol)
    val oldc = cents.flatMap { case (cid, vec) =>
      vec.zipWithIndex.map { case (v, i) => (cid, i, v.toDouble) }
    }.toDF("cluster_id", "i", "c")
    val assigned = df.withColumn("__best", assignExpr(vecCol, cents))
      .select(col("__best.cid").as("cluster_id"),
        col("__best.dist2").as("dist2"), col(vecCol).as("__v"))
    val per = assigned
      .select(col("cluster_id"), col("dist2"),
        posexplode(col("__v")).as(Seq("i", "x")))
      .groupBy(col("cluster_id"), col("i"))
      .agg(sum(col("x").cast("double").cast("decimal(38,18)")).as("sx"),
        count(lit(1)).as("nn"),
        sum(col("dist2").cast("decimal(38,18)")).as("sd"))
    per.join(broadcast(oldc), Seq("cluster_id", "i"))
      .withColumn("m", col("sx").cast("double") / col("nn").cast("double"))
      .groupBy(col("cluster_id"))
      .agg(max(col("nn")).as("n_assigned"),
        // sd is the SAME decimal value for every dim row of a cluster
        // (each member's dist2 lands once per dim) — max picks it
        round(max(col("sd")).cast("double"), 6).as("wcss"),
        round(sum(((col("m") - col("c")) * (col("m") - col("c")))
          .cast("decimal(38,18)")).cast("double"), 6).as("shift2"))
  }

  /** Fixed-iteration k-means Lloyd TRAINING loop — the composed form
    * of [[kmeansStep]] that actually produces a trained coarse
    * quantizer for [[ivfBuild]]/[[ivfSearch]]. Per iteration: ONE
    * corpus scan (map-only inlined-centroid argmin assignment — no
    * joins, no per-row shuffle beyond the (cluster, dim) aggregate),
    * then the k×d mean frame — bounded by the IVF contract (k small,
    * d fixed) — collects to the driver and becomes the next round's
    * inlined literal, exactly how production IVF trainers iterate
    * (centroids are driver/coordinator state; the corpus never
    * rendezvouses with itself). Fixed iterations keep the result
    * engine-replayable: the oracle unrolls the same rounds as SQL.
    *
    * Numeric contract, per coordinate: decimal(38,18)-exact member
    * sum → double mean → float32 centroid. Both engines compute the
    * identical decimal sum (order-independent), the identical double
    * quotient, and the identical round-to-nearest float32, so the
    * trained centroids are BIT-IDENTICAL cross-engine and every
    * downstream assignment/search agrees too. Empty clusters keep
    * their previous coordinates (n_assigned 0).
    *
    * Returns (cid, cvec array<float>, n_assigned) — the trained
    * quantizer plus last-round member counts.
    */
  def kmeansTrain(df: DataFrame, vecCol: String, idCol: String,
      init: DataFrame, cVecCol: String, cIdCol: String,
      iterations: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var cents = collectCentroids(init, cVecCol, cIdCol)
    var counts = Map.empty[Long, Long]
    for (_ <- 1 to iterations) {
      val assigned = df.withColumn("__best", assignExpr(vecCol, cents))
        .select(col("__best.cid").as("cluster_id"), col(vecCol).as("__v"))
      val per = assigned
        .select(col("cluster_id"), posexplode(col("__v")).as(Seq("i", "x")))
        .groupBy(col("cluster_id"), col("i"))
        .agg(sum(col("x").cast("double").cast("decimal(38,18)")).as("sx"),
          count(lit(1)).as("nn"))
        .collect() // ≤ k·d rows — bounded by the IVF contract
      val means: Map[Long, Map[Int, Float]] = per
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          cid -> rows.map(r => r.getInt(1) ->
            (r.getDecimal(2).doubleValue() / r.getLong(3).toDouble).toFloat).toMap
        }
      counts = per.groupBy(_.getLong(0))
        .map { case (cid, rows) => cid -> rows.head.getLong(3) }
      cents = cents.map { case (cid, old) =>
        means.get(cid) match {
          case Some(m) => (cid, old.indices.map(i => m(i)): Seq[Float])
          case None => (cid, old)
        }
      }
    }
    val countsF = counts
    cents.map { case (cid, v) => (cid, v, countsF.getOrElse(cid, 0L)) }
      .toDF(cIdCol, cVecCol, "n_assigned")
  }
}
