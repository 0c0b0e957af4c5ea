package graft.tools

import graft.GraftSession
import graft.ops.{Dedup, Par}
import org.apache.spark.sql.functions._

/** Dev harness: piece-level wall-clock of the LSH-gated tf·idf top-k
  * (usage: ProfTfidf <sfDir> [reps]) — times candidates, term counts,
  * df aggregate, weight join, vector fold, and scoring separately so
  * the sf10 budget can be attributed.
  */
object ProfTfidf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = GraftSession.local(32)
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to reps).foreach { rep =>
      var last = System.nanoTime()
      def lap(name: String, n: Long): Unit = {
        val now = System.nanoTime()
        println(f"[tfidf] rep$rep $name%-18s ${(now - last) / 1e9}%7.2f  rows=$n")
        last = now
      }
      val d = graft.Tables(spark, sfDir).documents
      val nDocs = d.count()
      lap("count", nDocs)
      val sig = Dedup.minhashSignature(d, "text", "doc_id", 8).localCheckpoint()
      lap("signatures", sig.count())
      val cand = Dedup.minhashCandidates(sig, "doc_id", 8, 1).localCheckpoint()
      lap("candidates", cand.count())
      val candDocs = cand.select(col("id_a").as("doc_id"))
        .unionAll(cand.select(col("id_b").as("doc_id"))).distinct().localCheckpoint()
      lap("cand_docs", candDocs.count())
      val tf = Par.widen(d)
        .select(col("doc_id"), explode(
          graft.expressions.TextSketchExpressions.termCounts(col("text"))).as("tc"))
        .select(col("doc_id"), col("tc.t").as("t"), col("tc.tf").as("tf"))
        .localCheckpoint()
      lap("term_counts", tf.count())
      val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= nDocs / 10).localCheckpoint()
      lap("df_agg", dfreq.count())
      val n = spark.range(1).select(lit(nDocs).as("n"))
      val wt = tf.join(dfreq, Seq("t")).join(broadcast(n))
        .select(col("doc_id"), col("t"),
          (col("tf") * (col("n").cast("double") / col("df").cast("double"))).as("wgt"))
      val vecs = wt.join(candDocs, Seq("doc_id"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(sqrt(sum((col("wgt") * col("wgt")).cast("decimal(38,18)"))
          .cast("double")).as("nrm"),
          map_from_arrays(collect_list(col("t")), collect_list(col("wgt"))).as("vec"))
        .localCheckpoint()
      lap("wt_join_vec_fold", vecs.count())
      val dotExpr = expr(
        """CAST(aggregate(map_keys(v_a), CAST(0 AS DECIMAL(38,18)),
          |  (acc, k) -> CAST(acc + CAST(element_at(v_a, k) *
          |     coalesce(element_at(v_b, k), CAST(0.0 AS DOUBLE))
          |     AS DECIMAL(38,18)) AS DECIMAL(38,18))) AS DOUBLE)""".stripMargin)
      val pairs = cand
        .join(vecs.select(col("doc_id").as("id_a"), col("nrm").as("n_a"),
          col("vec").as("v_a")).hint("shuffle_hash"), Seq("id_a"))
        .join(vecs.select(col("doc_id").as("id_b"), col("nrm").as("n_b"),
          col("vec").as("v_b")).hint("shuffle_hash"), Seq("id_b"))
        .withColumn("dotp", dotExpr)
        .withColumn("cos", col("dotp") / (col("n_a") * col("n_b")))
        .filter(col("cos") >= 0.3)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      val k3 = graft.plans.NativeOps.topKPerGroup(pairs, Seq("id_b"),
        Seq(("cos", false), ("id_a", true)), 3)
      lap("score_topk", k3.count())
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
