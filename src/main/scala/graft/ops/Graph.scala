package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames — the sibling of the
  * dedup family's connected components ([[Dedup]] label propagation).
  *
  * PageRank here is the bounded-iteration batch form: each iteration
  * is one join (edges ⋈ ranks, both pre-partitioned on the source
  * key) plus one aggregation on the destination key — the standard
  * two-shuffle-per-iteration shape that scales linearly in edges.
  * Convergence detection is deliberately NOT built in: the driver
  * contract needs a deterministic result, and at 100 TB fixed small
  * iteration counts (5-20) are how production ranks are actually run
  * (per-iteration cost is predictable, checkpointing bounds lineage).
  */
object Graph {

  /** Materializes pre-annotated edges: returns (src, dst, outdeg). If
    * the input already carries `outdeg` (a staged graph frame — the
    * amortized-index contract) it is taken as-is; otherwise out-degree
    * is computed with one window over `src`.
    */
  private def withOutdeg(edges: DataFrame): DataFrame =
    if (edges.columns.contains("outdeg"))
      edges.select(col("src"), col("dst"), col("outdeg"))
    else edges.select(col("src"), col("dst"))
      .withColumn("outdeg", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))

  private def cpBlocks(df: DataFrame) =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** Fixed-iteration PageRank. `edges` must carry `src`/`dst` string
    * columns (directed; add both directions for an undirected graph)
    * and MAY carry a precomputed `outdeg` (staged graph input — skips
    * the degree window). Dangling nodes (no out-edges) contribute
    * nothing — standard simplified formulation, matched exactly by the
    * SQL oracle. `nodesOpt` supplies a pre-staged node universe
    * (single `node` column) so the per-query src∪dst distinct shuffle
    * disappears when the graph is an amortized index.
    *
    * `damping` and `teleport` are both explicit literals rather than
    * deriving teleport = 1 - damping: `1 - 0.85` is
    * 0.15000000000000002 in binary doubles, and the oracle's SQL
    * literal `0.15` is not — passing both keeps the two engines
    * bit-identical.
    *
    * Round shape: ONE edges ⋈ ranks equi-join (broadcast under the
    * node-count cap) + ONE union-aggregate that merges the teleport
    * base row with the damped contribution row per node — the old
    * nodes ⋈ contrib left-join is gone; per node the sum has exactly
    * the two addends (base, damping·inc) the oracle's unrolled SQL
    * adds, so the values stay bit-identical (IEEE addition of two
    * terms is commutative). Lineage is cut every `cpEvery` rounds AND
    * on the final round (the returned frame owns no live caches), so
    * an N-round rank costs ~N/cpEvery driver actions instead of N —
    * the per-action planning/codegen fixed cost was the measured
    * sweep-tail dominator at sf0.1, not the data.
    */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.85,
      teleport: Double = 0.15, nodesOpt: Option[DataFrame] = None,
      cpEvery: Int = 2, bcastCapBytes: Long = 64L * 1024 * 1024): DataFrame = {
    // A STAGED edge frame (outdeg pre-annotated — the amortized-index
    // contract, ideally a src-bucketed table) is NOT cached: it is
    // storage-backed and column-pruned, each round's scan is
    // memory-neutral, and a bucketed scan hands the join its hash
    // partitioning AND sort order — caching 120M rows on an 8 GB heap
    // was the sf10 pressure source. An AD-HOC frame is cached so the
    // degree window doesn't re-execute per round.
    val staged = edges.columns.contains("outdeg")
    val e0 = if (staged) withOutdeg(edges) else withOutdeg(edges).cache()
    // A CALLER-SUPPLIED node universe is never cached or unpersisted
    // here: it is typically storage-backed (the staged-graph parquet),
    // and cache-then-unpersist on a caller frame would silently evict
    // blocks the caller pinned for reuse across queries (ADVICE r9).
    val ownNodes = nodesOpt.isEmpty
    val nodes = nodesOpt.getOrElse(
      e0.select(col("src").as("node"))
        .union(e0.select(col("dst").as("node"))).distinct().cache())
    val n = nodes.count() // also materializes the caches' inputs
    // SMALL staged graphs (under the rank-broadcast cap — the same
    // regime test the join uses) cache their edges too: at that size
    // re-scanning the table per round costs more than the blocks.
    // LARGE staged graphs stay storage-backed — the bucketed scan is
    // memory-neutral and already hands the join its partitioning+sort
    // (caching 120M rows was the sf10 heap-pressure source).
    val e = if (staged && n * 100L < bcastCapBytes) e0.cache() else e0
    // A checkpointed rank frame carries no stats, so Catalyst will
    // NOT broadcast it on its own and every round pays a sort-merge
    // join over the edge list (measured 3-6x slower per round at
    // sf0.1). n is already known here: broadcast the ranks while they
    // are genuinely small. A (string node, double) row serializes to
    // ~100 bytes, so cap the broadcast at 64 MB (~640k nodes) — the
    // old 5M-row cap meant hundreds of MB per round, a realistic
    // driver/executor OOM. Hint-broadcasts have no explicit destroy:
    // each round's copy becomes unreachable when `pr` is reassigned
    // and the ContextCleaner reclaims it, so the byte cap is the real
    // safety lever; above it the shuffle join takes over.
    val bcastRanks = n * 100L < bcastCapBytes
    var pr = nodes.withColumn("pr", lit(1.0 / n))
    var owned: DataFrame = null // last checkpointed frame whose blocks we own
    for (it <- 1 to iterations) {
      val ranks = if (bcastRanks) broadcast(pr) else pr
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst").as("node"), (col("pr") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("inc"))
      var next = nodes.select(col("node"), lit(teleport / n).as("v"))
        .unionAll(contrib.select(col("node"), (lit(damping) * col("inc")).as("v")))
        .groupBy("node").agg(sum(col("v")).as("pr"))
      // The FINAL round stays lazy: the caller's first action (count,
      // write, collect) materializes it straight off the last owned
      // checkpoint — a whole driver action (planning + codegen + job)
      // saved per query. Intermediate checkpoints land every cpEvery
      // rounds; the un-superseded last one stays alive for the
      // returned plan (the ContextCleaner reclaims it when the caller
      // drops the frame).
      if (it % cpEvery == 0 && it < iterations) {
        next = next.localCheckpoint()
        if (owned != null) cpBlocks(owned).foreach(_.unpersist(blocking = false))
        owned = next
      }
      pr = next
    }
    // Materialize the final round, then free every block this call
    // pinned. Dataset.cache() entries are held STRONGLY by Spark's
    // CacheManager — they are never GC/ContextCleaner-reclaimed, so a
    // lazy tail would pin the edge+node blocks for the session
    // lifetime, and a later plan-identical call could even be served
    // stale cached edges after the underlying path is re-staged. The
    // one extra node-sized checkpoint action is the price of a
    // leak-free contract (localCheckpoint blocks DO die with the RDD
    // reference).
    val out = pr.localCheckpoint()
    if (owned != null) cpBlocks(owned).foreach(_.unpersist(blocking = false))
    e.unpersist(blocking = false)
    if (ownNodes) nodes.unpersist(blocking = false)
    out
  }

  /** Personalized PageRank: the teleport mass lands ONLY on the
    * `sources` set (uniformly) instead of every node — the
    * neighborhood-relevance ranking recommenders and related-entity
    * queries run ("important FROM this seed's point of view").
    *
    * SPARSE state (the r10→r11 gap fix — PPR at sf10 ran 40% behind
    * [[pageRank]] on the same staged graph): because base = 0 for
    * every non-seed node, the iterated frame only needs the REACHED
    * set — seeds plus nodes with inbound contribution. Unreached
    * nodes hold pr = 0, and a pr = 0 state row feeds the next round
    * only exact-zero addends (0.0/outdeg into `inc` sums, 0.0 base
    * into the merge), and adding +0.0 to an IEEE partial sum of
    * non-negative doubles never changes it — so dropping those rows
    * is BIT-IDENTICAL to the dense iteration the oracle unrolls. One
    * round is one edges ⋈ state join + one union-aggregate whose
    * per-node sum has at most the oracle's two addends (base,
    * damping·inc); the state rows are (node, pr) — narrower AND fewer
    * than [[pageRank]]'s, so a PPR round can never cost more. The
    * full node set returns at the END via one left join (unreached →
    * 0.0), so callers still see every node. Same broadcast cap and
    * localCheckpoint lineage discipline as [[pageRank]].
    */
  def personalizedPageRank(edges: DataFrame, sources: DataFrame,
      iterations: Int, damping: Double = 0.85,
      teleport: Double = 0.15, nodesOpt: Option[DataFrame] = None,
      cpEvery: Int = 2, bcastCapBytes: Long = 64L * 1024 * 1024): DataFrame = {
    // staged-vs-ad-hoc (and small-vs-large) cache policy — see [[pageRank]],
    // including the caller-owned nodesOpt no-cache/no-unpersist contract
    val staged = edges.columns.contains("outdeg")
    val e0 = if (staged) withOutdeg(edges) else withOutdeg(edges).cache()
    val ownNodes = nodesOpt.isEmpty
    val nodes = nodesOpt.getOrElse(
      e0.select(col("src").as("node"))
        .union(e0.select(col("dst").as("node"))).distinct().cache())
    val n = nodes.count()
    val e = if (staged && n * 100L < bcastCapBytes) e0.cache() else e0
    val src = sources.select(col("node")).distinct()
    val nS = src.count()
    require(nS > 0, "personalizedPageRank needs at least one source")
    val bcastRanks = n * 100L < bcastCapBytes
    // the seed-base frame is nS rows — it rides each round's merge as
    // a broadcast-sized union arm instead of a column on every node
    val seedBase = src.select(col("node"), lit(teleport / nS).as("v"))
      .localCheckpoint()
    var state = src.select(col("node"), lit(1.0 / nS).as("pr"))
    var owned: DataFrame = null
    for (it <- 1 to iterations) {
      val ranks = if (bcastRanks) broadcast(state) else state
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst").as("node"), (col("pr") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("inc"))
      var next = seedBase
        .unionAll(contrib.select(col("node"),
          (lit(damping) * col("inc")).as("v")))
        .groupBy("node").agg(sum(col("v")).as("pr"))
      // final round lazy — see [[pageRank]]'s checkpoint-cadence note
      if (it % cpEvery == 0 && it < iterations) {
        next = next.localCheckpoint()
        if (owned != null) cpBlocks(owned).foreach(_.unpersist(blocking = false))
        owned = next
      }
      state = next
    }
    // re-densify: the full node universe with 0.0 for never-reached
    // nodes, exactly the dense iteration's (and the oracle's) output
    val out = nodes
      .join(state.withColumnRenamed("pr", "__pr"), Seq("node"), "left")
      .select(col("node"), coalesce(col("__pr"), lit(0.0)).as("pr"))
      .localCheckpoint()
    if (owned != null) cpBlocks(owned).foreach(_.unpersist(blocking = false))
    cpBlocks(seedBase).foreach(_.unpersist(blocking = false))
    e.unpersist(blocking = false)
    if (ownNodes) nodes.unpersist(blocking = false)
    out
  }

  /** Multi-source BFS levels over an undirected graph: `level` =
    * shortest hop distance from any source node, explored up to
    * `maxDepth`. Per round: frontier ⋈ edges (one equi-join on the
    * frontier key) + an anti-join against the visited set — the
    * frontier-expansion shape whose per-round cost scales with the
    * FRONTIER's edges, not the graph. Each round's frames are
    * `localCheckpoint`ed and superseded blocks freed, the
    * [[Dedup]]-CC lineage discipline. Unreached nodes are absent
    * (callers left-join if they want nulls).
    */
  def bfsLevels(edges: DataFrame, sources: DataFrame, maxDepth: Int): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct().cache()
    def cpBlocks(df: DataFrame) = df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    var visited = sources.select(col("node")).distinct()
      .withColumn("level", lit(0)).localCheckpoint()
    var frontier = visited
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      val next = und.join(frontier, und("src") === frontier("node"))
        .select(und("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("level", lit(depth)).localCheckpoint()
      val merged = visited.unionAll(next).localCheckpoint()
      cpBlocks(visited).foreach(_.unpersist(blocking = false))
      cpBlocks(frontier).foreach(_.unpersist(blocking = false))
      visited = merged
      frontier = next
    }
    und.unpersist(blocking = false)
    visited
  }

  /** Bounded-hop single-source shortest paths (frontier Bellman-Ford)
    * over integer-weighted undirected edges (`src`, `dst`, `w` > 0).
    * After round r the distance column is EXACTLY the min cost over
    * paths with ≤ r edges (the classic relaxation invariant — the
    * frontier variant preserves it because every prefix of a best
    * ≤r-hop path put its endpoint in some earlier frontier), so a
    * fixed `rounds` bound makes the result engine-independent: the
    * oracle replays the same bound as a hop-limited recursive CTE.
    * Early exit on an empty frontier is safe — a fixed point means no
    * path of ANY length improves, which subsumes the hop bound.
    *
    * Per round: frontier ⋈ edges (cost scales with the frontier's
    * out-edges, not the graph) + a full-outer min-merge into the
    * distance frame; both shuffle on the node key. Integer weights
    * keep every distance exact (no float-sum drift cross-engine).
    * Rounds are `localCheckpoint`ed and superseded blocks freed — the
    * same lineage discipline as [[pageRank]]/[[bfsLevels]].
    */
  def shortestPaths(edges: DataFrame, sources: DataFrame, rounds: Int): DataFrame = {
    val und = edges.select(col("src"), col("dst"), col("w"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w")).cache()
    def cpBlocks(df: DataFrame) = df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    var dist = sources.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = dist
    var r = 0
    while (r < rounds && !frontier.isEmpty) {
      r += 1
      val cand = und.join(frontier, und("src") === frontier("node"))
        .select(und("dst").as("node"), (col("dist") + col("w")).as("d2"))
        .groupBy(col("node")).agg(min(col("d2")).as("d2"))
      val merged = dist.join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          least(coalesce(col("dist"), col("d2")), coalesce(col("d2"), col("dist"))).as("dist"),
          (col("dist").isNull || (col("d2").isNotNull && col("d2") < col("dist")))
            .as("__improved"))
        .localCheckpoint()
      val nextFrontier = merged.filter(col("__improved"))
        .select(col("node"), col("dist")).localCheckpoint()
      cpBlocks(dist).foreach(_.unpersist(blocking = false))
      cpBlocks(frontier).foreach(_.unpersist(blocking = false))
      dist = merged.select(col("node"), col("dist"))
      frontier = nextFrontier
    }
    und.unpersist(blocking = false)
    dist
  }

  /** Triangle count via DEGREE-ORDERED edge orientation — the standard
    * bounded-wedge formulation. Undirected input edges (`src`, `dst`;
    * duplicates and self-loops tolerated) are oriented from the
    * lower-degree endpoint to the higher (ties broken by id), so every
    * wedge is enumerated at its lowest-degree apex: the wedge join
    * fans out by min-degree, not max-degree — on skewed graphs (the
    * whole point at 100 TB) a hub of degree d contributes O(d) wedge
    * rows instead of O(d²). Three shuffles total: degree agg, the
    * wedge self-join on the apex, and the closing-edge semi-join.
    * Returns one row: (n_nodes, n_edges, n_triangles).
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    // canonical undirected edge set: a < b, self-loops dropped.
    // localCheckpoint: `und` feeds the degree agg, the orientation
    // join, AND the closing-edge probe — without materializing it the
    // whole upstream edge construction re-executes per use (measured
    // 3.6 s -> ~1.5 s at sf0.1 on the co-basket graph).
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // orient low-degree -> high-degree (tie: smaller id first)
    val dirEdges = und
      .join(deg.select(col("node").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("v"))
    val e1 = dirEdges.select(col("u").as("apex"), col("v").as("x"))
    val e2 = dirEdges.select(col("u").as("apex"), col("v").as("y"))
    val wedges = e1.join(e2, Seq("apex")).filter(col("x") < col("y"))
    val closing = und.select(
      least(col("a"), col("b")).as("x"), greatest(col("a"), col("b")).as("y"))
    val tri = wedges.join(closing, Seq("x", "y"), "left_semi")
    deg.agg(count(lit(1)).as("n_nodes")).crossJoin(
        und.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
  }

  /** Bounded-round k-core peeling over an undirected graph: each round
    * drops every node of degree < k (and its edges) simultaneously,
    * `rounds` times. After r rounds the survivor set is EXACTLY
    * determined by (graph, k, r) — peeling is a simultaneous fixpoint
    * step, not an ordering-sensitive removal — so a fixed bound keeps
    * the result engine-independent and the oracle replays the same
    * rounds as unrolled SQL. If a round removes nothing the loop exits
    * early: peeling has reached the true k-core and further rounds are
    * identity (the same invariant [[shortestPaths]] leans on).
    *
    * Per round: one degree aggregation + one semi-join of edges
    * against the surviving nodes per endpoint — cost scales with the
    * REMAINING edge set, which only shrinks. Rounds are
    * `localCheckpoint`ed with superseded blocks freed, the shared
    * lineage discipline of this file's iterative ops. Returns the
    * surviving nodes with their within-core degree.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    def cpBlocks(df: DataFrame) = df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    var und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    var nEdges = und.count()
    var r = 0
    var removedSomething = true
    while (r < rounds && removedSomething) {
      r += 1
      val deg = und.select(col("a").as("node"))
        .unionAll(und.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select(col("node"))
      val pruned = und
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b")).localCheckpoint()
      val nPruned = pruned.count()
      removedSomething = nPruned < nEdges
      nEdges = nPruned
      cpBlocks(und).foreach(_.unpersist(blocking = false))
      und = pruned
    }
    und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).cast("long").as("core_degree"))
  }

  /** Fixed-iteration HITS (Kleinberg hubs-and-authorities) over a
    * directed edge list — the sibling of [[pageRank]] with the same
    * two-shuffle-per-iteration shape: each half-step is one edge ⋈
    * scores equi-join plus one aggregation on the opposite endpoint.
    *
    * Normalization divides by the L2 norm computed as an EXACT
    * DECIMAL(38,18) power sum (the [[Aggregates]] moment discipline):
    * the squares are cast to decimal before summing, so the global
    * reduction is order-independent and the oracle's unrolled CTEs
    * reproduce it; only the per-node incoming sums stay IEEE doubles
    * (same-magnitude addends, absorbed by the caller's rounding — the
    * [[pageRank]] convention). The one-row norm frame is
    * broadcast-joined, so scores never funnel through the driver.
    * Score frames are broadcast under the same 64 MB node-count cap
    * logic as [[pageRank]]; beyond it the equi-joins shuffle on the
    * node key.
    */
  def hits(edges: DataFrame, iterations: Int,
      edgesByDst: Option[DataFrame] = None): DataFrame = {
    // STAGED contract (the pageRank src-bucketed discipline): when the
    // caller passes `edgesByDst`, BOTH frames are pre-distinct'd,
    // self-loop-free, storage-backed bucketed tables — `edges` by src,
    // `edgesByDst` by dst — so each half-step's equi-join takes the
    // scan's hash partitioning + per-bucket sort as-is and only the
    // node-sized score frame shuffles. Staged frames are NOT cached:
    // the bucketed scan is memory-neutral (caching 12M+ rows was the
    // sf10 heap-pressure shape) and caching would DISCARD the bucket
    // layout the join needs.
    val staged = edgesByDst.isDefined
    val eBase = if (staged) edges.select(col("src"), col("dst"))
      else edges.select(col("src"), col("dst")).distinct()
        .filter(col("src") =!= col("dst")).cache()
    val e = eBase
    val eD = edgesByDst.getOrElse(e)
    // node count ≤ 2·edges: the broadcast cap decision only needs an
    // upper bound, so no separate node-universe frame is built — the
    // output's hub ∪ auth full-outer merge already spans every node
    // (each node has an out-edge → hub side, or an in-edge → auth side)
    val nE = e.count() // ad-hoc: materializes the cache once, before the loop
    val bcast = 2L * nE * 100L < 64L * 1024 * 1024
    def maybeBcast(df: DataFrame) = if (bcast) broadcast(df) else df
    def cpBlocks(df: DataFrame) = df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    // Nodes with no in-edges (auth 0) / no out-edges (hub 0) are
    // completed only at the END: inside the loop a zero score
    // contributes zero to every downstream sum, so the propagation
    // frames stay aggregate-sized and each half-step materializes ONE
    // node-sized frame instead of a score frame plus its
    // zero-completion. Normalization stays lazy — the raw aggregate is
    // checkpointed, the one-row L2 norm (exact decimal power sum, see
    // scaladoc) rides as a broadcast join in the NEXT half-step's plan.
    def l2normalize(raw: DataFrame, c: String): DataFrame = {
      val n2 = raw.agg(
        sum((col(c) * col(c)).cast("decimal(38,18)")).cast("double").as("__n2"))
      raw.join(broadcast(n2))
        .select(col("node"), (col(c) / sqrt(col("__n2"))).as(c))
    }
    // ONE materialization per iteration (the hub frame): the auth
    // half-step stays lazy inside the hub half-step's plan — its
    // aggregate exchange is read by both the norm scalar and the hub
    // join and lands once via exchange reuse; the checkpoint then caps
    // the lineage. The final output re-derives the last auth from the
    // PREVIOUS hub checkpoint (one extra join+agg), so a two-deep hub
    // history must stay alive until the caller's action.
    var hub = e.select(col("src").as("node")).distinct()
      .withColumn("hub", lit(1.0)).localCheckpoint()
    var hubPrev: DataFrame = null
    var authLast: DataFrame = null
    for (_ <- 1 to iterations) {
      val authRaw = e.join(maybeBcast(hub), e("src") === hub("node"))
        .groupBy(e("dst").as("node")).agg(sum(col("hub")).as("auth"))
      authLast = authRaw
      val authN = l2normalize(authRaw, "auth")
      val hubRaw = eD.join(maybeBcast(authN), eD("dst") === authN("node"))
        .groupBy(eD("src").as("node")).agg(sum(col("auth")).as("hub"))
        .localCheckpoint()
      if (hubPrev != null) cpBlocks(hubPrev).foreach(_.unpersist(blocking = false))
      hubPrev = hub // still referenced by authLast — freed next round
      hub = l2normalize(hubRaw, "hub")
    }
    val out = hub
      .join(l2normalize(authLast, "auth").withColumnRenamed("node", "__an"),
        col("node") === col("__an"), "full_outer")
      .select(coalesce(col("node"), col("__an")).as("node"),
        coalesce(col("hub"), lit(0.0)).as("hub"),
        coalesce(col("auth"), lit(0.0)).as("auth"))
    if (!staged) e.unpersist(blocking = false) // ad-hoc cache only — never a caller's frame
    out
  }

  /** Synchronous label-propagation community detection (LPA), fixed
    * iteration count. Each node adopts the most frequent label among
    * its NEIGHBORS (classic LPA — a node's own label only persists
    * through isolation), ties broken by the SMALLEST label, so every
    * round is deterministic and the oracle replays it as unrolled
    * CTEs. Labels start as the node's own id.
    *
    * Per round: one labels ⋈ edges equi-join, a (node, label) count
    * aggregation, a per-node max via one partitioned window, and a
    * min-label tie-break aggregation — every shuffle is on the node
    * key, nothing is quadratic in degree, and rounds are
    * `localCheckpoint`ed with superseded blocks freed (the file's
    * shared lineage discipline). A fixed small iteration count is the
    * production form: convergence-detected async LPA is
    * schedule-dependent, which the driver contract (and any rerun-
    * stable pipeline) cannot tolerate.
    */
  def labelPropagation(edges: DataFrame, iterations: Int,
      undOpt: Option[DataFrame] = None,
      nodesOpt: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // STAGED contract (the [[hits]]/[[pageRank]] discipline): `undOpt`
    // is the pre-symmetrized, distinct, self-loop-free edge frame as a
    // dst-bucketed table (the per-round join key), `nodesOpt` the
    // storage-backed node universe. Staged frames are neither cached
    // (bucketed scans are memory-neutral and caching drops the bucket
    // layout) nor unpersisted (caller-owned).
    val staged = undOpt.isDefined
    val und = undOpt.getOrElse(edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct().cache())
    val ownNodes = nodesOpt.isEmpty
    val nodes = nodesOpt.getOrElse(
      und.select(col("src").as("node")).distinct().cache())
    val n = nodes.count()
    // label frames are node-sized (~100 B/row): broadcast them into the
    // edge join under the same 64 MB cap as [[pageRank]]'s rank frames
    val bcast = n * 100L < 64L * 1024 * 1024
    def maybeBcast(df: DataFrame) = if (bcast) broadcast(df) else df
    def cpBlocks(df: DataFrame) = df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    var labels = nodes.withColumn("label", col("node")).localCheckpoint()
    for (_ <- 1 to iterations) {
      val neigh = und.join(maybeBcast(labels), und("dst") === labels("node"))
        .groupBy(und("src").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val maxed = neigh.withColumn("mx",
          max(col("cnt")).over(Window.partitionBy(col("node"))))
        .filter(col("cnt") === col("mx"))
        .groupBy(col("node")).agg(min(col("label")).as("label"))
      val next = nodes.join(maxed, Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("node")).as("label"))
        .localCheckpoint()
      cpBlocks(labels).foreach(_.unpersist(blocking = false))
      labels = next
    }
    if (!staged) und.unpersist(blocking = false)
    if (ownNodes) nodes.unpersist(blocking = false)
    labels
  }

  /** Bipartite neighborhood-Jaccard k-NN graph (link prediction /
    * similarity-graph construction): two nodes are similar when their
    * ATTRIBUTE sets overlap — J(a,b) = |A_a ∩ A_b| / |A_a ∪ A_b| —
    * and each node keeps its `k` best matches (jaccard desc, id asc:
    * fully deterministic ranks). The top-k form is the scale-portable
    * contract: a fixed similarity threshold is meaningless across data
    * sizes (co-occurrence degrees grow linearly with volume, so any
    * cut saturates to everything or nothing), while "k nearest per
    * node" has SF-invariant output size — it is how k-NN graphs for
    * clustering/label-propagation stages are actually built.
    *
    * Scale shape: candidate pairs are generated ONLY through shared
    * attributes (the inverted-index wedge self-join — never node ×
    * node), so cost is Σ_attr fanout², bounded by the ENFORCED
    * per-attribute fanout contract ([[Guard.maxGroupWidth]] fails fast
    * naming the offending attribute — the [[triangleCount]] /
    * basket-lift discipline) instead of silently exploding on a
    * ubiquitous attribute. The wedge stream carries ids only; degrees
    * are node-sized and join AFTER the pair-count aggregation. The
    * distinct (node, attr) projection is localCheckpoint'ed because it
    * feeds the degree agg and both wedge sides — without it the
    * upstream distinct re-executes three times (the [[triangleCount]]
    * lesson).
    */
  def bipartiteJaccardTopK(rel: DataFrame, nodeCol: String, attrCol: String,
      k: Int, maxAttrFanout: Long): DataFrame = {
    // DISK_ONLY, not localCheckpoint: the frame is attr-relation-sized
    // (60M rows at sf10) with three consumers (degree agg + both join
    // sides). Memory-backed blocks pinned ~2 GB of the 8 GB heap for
    // the whole query and starved the pair aggregation (measured OOM);
    // un-persisted, the distinct subtree re-executed per consumer
    // (122 s at sf10). Disk blocks cost one compute + three scans and
    // zero heap — the stagePsGraph storage-backed-boundary shape,
    // scoped to the call (freed below once the bounded top-k
    // materializes).
    val sp = Guard.maxGroupWidth(
        rel.select(col(nodeCol).as("node"), col(attrCol).as("attr")).distinct(),
        Seq("attr"), maxAttrFanout)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val deg = sp.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val cand = sp.select(col("attr"), col("node").as("a"))
      .join(sp.select(col("attr"), col("node").as("b")), Seq("attr"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
    val j = cand
      .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), Seq("b"))
      .withColumn("jaccard", col("common").cast("double") /
        (col("deg_a") + col("deg_b") - col("common")).cast("double"))
    // Both orientations via ONE generator over the scored pairs — a
    // unionAll of two selects INLINES the whole candidate join+agg
    // subtree twice into one stage graph (2× the compute and 2× the
    // concurrent memory: measured OOM at sf10, where the subtree is a
    // 240M-pair aggregation). The explode streams the same rows out of
    // a single pass and the top-k heaps bound everything downstream.
    val sym = j.select(explode(array(
        struct(col("a").as("node"), col("b").as("other"),
          col("common"), col("jaccard")),
        struct(col("b").as("node"), col("a").as("other"),
          col("common"), col("jaccard")))).as("r"))
      .select(col("r.node").as("node"), col("r.other").as("other"),
        col("r.common").as("common"), col("r.jaccard").as("jaccard"))
    // bounded output (≤ nodes·k): materialize eagerly, then free the
    // disk blocks — the containmentPairs cache-lifetime discipline
    val out = Aggregates.topKPerGroup(sym, Seq("node"),
        Seq(col("jaccard").desc, col("other").asc), k)
      .select(col("node"), col("other"), col("common"), col("jaccard"),
        col("rn").cast("bigint").as("rn"))
      .localCheckpoint()
    sp.unpersist(blocking = false)
    out
  }
}
