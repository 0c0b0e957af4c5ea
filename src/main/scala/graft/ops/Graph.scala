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

  /** Fixed-iteration PageRank. `edges` must carry `src`/`dst` string
    * columns (directed; add both directions for an undirected graph).
    * Dangling nodes (no out-edges) contribute nothing — standard
    * simplified formulation, matched exactly by the SQL oracle.
    *
    * `damping` and `teleport` are both explicit literals rather than
    * deriving teleport = 1 - damping: `1 - 0.85` is
    * 0.15000000000000002 in binary doubles, and the oracle's SQL
    * literal `0.15` is not — passing both keeps the two engines
    * bit-identical.
    *
    * Lineage: each iteration's plan builds on the previous one; for
    * iteration counts beyond ~10, interpose `localCheckpoint` like
    * [[Dedup]]'s connected components does.
    */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.85,
      teleport: Double = 0.15): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val outdeg = e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val n = nodes.count()
    var pr = nodes.withColumn("pr", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val contrib = e.join(pr, e("src") === pr("node"))
        .join(outdeg, "src")
        .select(col("dst").as("node"), (col("pr") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("inc"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport / n) + lit(damping) * coalesce(col("inc"), lit(0.0))).as("pr"))
    }
    pr
  }
}
