package graft.queries

import graft.Tables
import graft.ops.{AsOf, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** As-of join + embedding near-dup demos (SURVEY.md §2.C C5 extension,
  * §2.J J2 scale path).
  */
object QAsOf {
  type Q = (SparkSession, String) => DataFrame

  private def dDot(a: String, b: String) =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  /** √N IVF sizing (VERDICT r11 item 1): k = ceil(sqrt(N)) centroids,
    * so buckets average √N vectors and total per-bucket pairs stay
    * O(N^1.5) — the fixed 8-centroid demo gate made them (N/8)²,
    * quadratic at 100×. The k-th-smallest-ids centroid pick and the
    * ceil(sqrt(count)) rule are replayed verbatim by the oracle (both
    * engines compute IEEE-double sqrt of the same integer, so k is in
    * lockstep). count() on parquet resolves from footer metadata —
    * no data scan. PlanShapeSpec pins the O(N^1.5) pair bound.
    */
  private def sqrtCentroids(emb: DataFrame): DataFrame = {
    val k = math.ceil(math.sqrt(emb.count().toDouble)).toLong
    emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
  }

  /** The oracle-side twin of [[sqrtCentroids]]. */
  private val cSql =
    "SELECT vec_id AS cid, embedding AS cvec FROM embeddings " +
      "WHERE vec_id < (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings)"

  val queries: Map[String, Q] = Map(
    // As-of backward join: each click matched to the user's most recent
    // purchase at-or-before it. Union-merge plan: one shuffle of L+R.
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts_ns"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_event_id"),
          col("value").as("p_value"), col("ts_ns"))
      AsOf.asofBackward(clicks, purchases, "user_id", "ts_ns", "ts_ns",
        Map("p_event_id" -> "purchase_event_id", "p_value" -> "purchase_value"))
        .select("user_id", "event_id", "purchase_event_id", "purchase_value")
    }),

    // As-of FORWARD join: each click matched to the user's next
    // purchase at-or-after it (deterministic (ts, event_id) tie-break).
    "q_asof_forward" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts_ns"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_event_id"),
          col("value").as("p_value"), col("ts_ns"))
      AsOf.asofForward(clicks, purchases, "user_id", "ts_ns", "ts_ns", "p_event_id",
        Map("p_event_id" -> "next_purchase_id", "p_value" -> "next_purchase_value"))
        .select("user_id", "event_id", "next_purchase_id", "next_purchase_value")
    }),

    // As-of NEAREST join: whichever purchase is closest in time,
    // either direction; equidistant resolves backward.
    "q_asof_nearest" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts_ns"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_event_id"),
          col("value").as("p_value"), col("ts_ns"))
      AsOf.asofNearest(clicks, purchases, "user_id", "event_id", "ts_ns", "ts_ns", "p_event_id",
        Map("p_event_id" -> "nearest_purchase_id", "p_value" -> "nearest_purchase_value"))
        .select("user_id", "event_id", "nearest_purchase_id", "nearest_purchase_value")
    }),

    // Embedding near-dup pairs, IVF-bucketed: pairs only form inside a
    // cluster (the 100 TB path — candidate generation is an equi-join
    // on cluster_id, never all-pairs), then exact cosine filters.
    "q_embed_neardup" -> ((s, dir) => {
      graft.expressions.VectorExpressions.register(s)
      val emb = Tables(s, dir).embeddings
      val centroids = sqrtCentroids(emb)
      // keep-columns assignment (r13, guide §2.4): one map-only scan
      // carries (vec_id, embedding, cluster_id) — the former
      // (id, cluster_id) ⋈ corpus join-back re-scanned the vector
      // table for rows the argmin scan already held (1:1 on vec_id,
      // so the row set is unchanged)
      val assigned = Similarity.ivfAssignWith(
        emb.select(col("vec_id"), col("embedding")),
        "embedding", centroids, "cvec", "cid")
      // normalize once per vector; each pair then costs one dot fold
      val normed = Similarity.withNormalized(assigned, "embedding", "ne")
        .select(col("cluster_id"), col("vec_id"), col("ne"))
      val a = normed.select(col("cluster_id"), col("vec_id").as("id_a"), col("ne").as("na"))
      val b = normed.select(col("cluster_id"), col("vec_id").as("id_b"), col("ne").as("nb"))
      a.join(b, Seq("cluster_id"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cos_sim", graft.expressions.VectorExpressions.dot(col("na"), col("nb")))
        .filter(col("cos_sim") >= 0.3)
        .select("cluster_id", "id_a", "id_b", "cos_sim")
    }),

    // J2-ext — semantic duplicate CLUSTERS: connected components over
    // the IVF-bucketed cosine pairs — the embedding-space twin of
    // q_dedup_clusters (which clusters MinHash text pairs), proving
    // the CC machinery composes across candidate generators.
    "q_semantic_clusters" -> ((s, dir) => {
      graft.expressions.VectorExpressions.register(s)
      val emb = Tables(s, dir).embeddings
      val centroids = sqrtCentroids(emb)
      // keep-columns assignment (r13): same map-only shape as
      // q_embed_neardup — the join-back on vec_id is gone
      val assigned = Similarity.ivfAssignWith(
        emb.select(col("vec_id"), col("embedding")),
        "embedding", centroids, "cvec", "cid")
      val normed = Similarity.withNormalized(assigned, "embedding", "ne")
        .select(col("cluster_id"), col("vec_id"), col("ne"))
      val a = normed.select(col("cluster_id"), col("vec_id").as("id_a"), col("ne").as("na"))
      val b = normed.select(col("cluster_id"), col("vec_id").as("id_b"), col("ne").as("nb"))
      val pairs = a.join(b, Seq("cluster_id"))
        .filter(col("id_a") < col("id_b"))
        .filter(graft.expressions.VectorExpressions.dot(col("na"), col("nb")) >= 0.3)
        .select(col("id_a"), col("id_b"))
      graft.ops.Dedup.connectedComponents(pairs, "id_a", "id_b")
        .select(col("node").as("vec_id"), col("cluster_id"))
    }),

    // J2-ext — SemDeDup: semantic dedup over the SAME cluster-bucketed
    // pair generation as q_embed_neardup, resolved to survivors by the
    // greedy smallest-id keep policy (drop a vector iff a smaller
    // τ-close id shares its cluster). The query returns the surviving
    // corpus ids — what a production pipeline joins back on to delete.
    "q_semantic_dedup" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val centroids = sqrtCentroids(emb)
      Similarity.semanticDedup(emb.select(col("vec_id"), col("embedding")),
        "embedding", "vec_id", centroids, "cvec", "cid", tau = 0.3)
    })
  )

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """SELECT c.user_id, c.event_id,
                p.event_id AS purchase_event_id, p.value AS purchase_value
         FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
         ASOF LEFT JOIN (SELECT user_id, event_id, value, ts FROM events WHERE event_type = 'purchase') p
           ON c.user_id = p.user_id AND p.ts <= c.ts""",
    "q_asof_forward" ->
      """SELECT c.user_id, c.event_id,
                p.event_id AS next_purchase_id, p.value AS next_purchase_value
         FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
         LEFT JOIN LATERAL (
           SELECT pp.event_id, pp.value FROM events pp
           WHERE pp.event_type = 'purchase' AND pp.user_id = c.user_id AND pp.ts >= c.ts
           ORDER BY pp.ts ASC, pp.event_id ASC LIMIT 1) p ON true""",
    "q_asof_nearest" ->
      """SELECT c.user_id, c.event_id,
                p.event_id AS nearest_purchase_id, p.value AS nearest_purchase_value
         FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
         LEFT JOIN LATERAL (
           SELECT pp.event_id, pp.value FROM events pp
           WHERE pp.event_type = 'purchase' AND pp.user_id = c.user_id
           ORDER BY abs(epoch_us(pp.ts) - epoch_us(c.ts)) ASC, pp.ts ASC, pp.event_id ASC
           LIMIT 1) p ON true""",
    "q_embed_neardup" ->
      s"""WITH c AS ($cSql),
          dists AS (
            SELECT e.vec_id, e.embedding, c.cid,
                   list_sum(list_transform(range(1, len(e.embedding) + 1),
                     i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))
                        * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)))) AS dist2
            FROM embeddings e CROSS JOIN c),
          assigned AS (
            SELECT vec_id, embedding, cid AS cluster_id FROM (
              SELECT vec_id, embedding, cid, dist2,
                     row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
              FROM dists) WHERE rn = 1),
          normed AS (
            SELECT cluster_id, vec_id,
                   list_transform(embedding,
                     x -> CAST(x AS DOUBLE) / sqrt(${dDot("embedding", "embedding")})) AS ne
            FROM assigned),
          pairs AS (
            SELECT a.cluster_id, a.vec_id AS id_a, b.vec_id AS id_b,
                   ${dDot("a.ne", "b.ne")} AS cos_sim
            FROM normed a JOIN normed b
              ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id)
          SELECT cluster_id, id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.3""",
    "q_semantic_clusters" ->
      s"""WITH RECURSIVE c AS ($cSql),
          dists AS (
            SELECT e.vec_id, e.embedding, c.cid,
                   list_sum(list_transform(range(1, len(e.embedding) + 1),
                     i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))
                        * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)))) AS dist2
            FROM embeddings e CROSS JOIN c),
          assigned AS (
            SELECT vec_id, embedding, cid AS cluster_id FROM (
              SELECT vec_id, embedding, cid, dist2,
                     row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
              FROM dists) WHERE rn = 1),
          normed AS (
            SELECT cluster_id, vec_id,
                   list_transform(embedding,
                     x -> CAST(x AS DOUBLE) / sqrt(${dDot("embedding", "embedding")})) AS ne
            FROM assigned),
          pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM normed a JOIN normed b
              ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
            WHERE ${dDot("a.ne", "b.ne")} >= 0.3),
          edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                    UNION SELECT id_b AS src, id_a AS dst FROM pairs),
          reach(node, label) AS (
            SELECT DISTINCT src, src FROM edges
            UNION
            SELECT e.dst, r.label FROM edges e JOIN reach r ON r.node = e.src)
          SELECT node AS vec_id, min(label) AS cluster_id FROM reach GROUP BY node""",
    "q_semantic_dedup" ->
      s"""WITH c AS ($cSql),
          dists AS (
            SELECT e.vec_id, e.embedding, c.cid,
                   list_sum(list_transform(range(1, len(e.embedding) + 1),
                     i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))
                        * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)))) AS dist2
            FROM embeddings e CROSS JOIN c),
          assigned AS (
            SELECT vec_id, embedding, cid AS cluster_id FROM (
              SELECT vec_id, embedding, cid, dist2,
                     row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
              FROM dists) WHERE rn = 1),
          normed AS (
            SELECT cluster_id, vec_id,
                   list_transform(embedding,
                     x -> CAST(x AS DOUBLE) / sqrt(${dDot("embedding", "embedding")})) AS ne
            FROM assigned),
          drops AS (
            SELECT DISTINCT b.vec_id
            FROM normed a JOIN normed b
              ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
            WHERE ${dDot("a.ne", "b.ne")} >= 0.3)
          SELECT e.vec_id FROM embeddings e
          WHERE e.vec_id NOT IN (SELECT vec_id FROM drops)"""
  )
}
