package graft.tools

import graft.GraftSession
import graft.ops.{Dedup, Text}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev harness: per-stage wall-clock breakdown of TrainingPrep.runV2
  * (usage: ProfPrep <sfDir> [reps]) — each stage materialized the same
  * way the pipeline does, timed separately, so the 8-second budget can
  * be attributed instead of argued about.
  */
object ProfPrep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = GraftSession.local(32)
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      var last = t0
      def lap(name: String): Unit = {
        val now = System.nanoTime()
        println(f"[prep] rep$rep $name%-22s ${(now - last) / 1e9}%6.2f")
        last = now
      }
      val documents = graft.Tables(spark, sfDir).documents
      val excised = Text.removeDuplicateSpans(documents, "text", "doc_id", 15)
        .select(col("doc_id"), col("clean_text").as("text"))
        .join(documents.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .localCheckpoint()
      lap("stage0_excise")
      val shingle = (d: DataFrame) => d.select(col("doc_id"),
        explode(graft.expressions.TextSketchExpressions
          .shingleHash64(col("text"), 8)).as("h"))
      val bench = shingle(excised.filter(col("doc_id") < 50))
        .select(col("h")).distinct()
      val train = excised.filter(col("doc_id") >= 50)
      val contaminated = shingle(train)
        .join(broadcast(bench), Seq("h"), "left_semi")
        .select(col("doc_id")).distinct()
      val decontam = train.join(contaminated, Seq("doc_id"), "left_anti")
        .localCheckpoint()
      lap("stage1_decontam")
      val sigDecontam = Dedup
        .minhashSignature(decontam, "text", "doc_id", 8).localCheckpoint()
      lap("stage2a_sig")
      val maxDf = documents.count() / 10
      val nearDrop = Dedup.tfidfCosineTopK(decontam, "text", "doc_id",
          maxDf, 0.3, k = 1, sigOpt = Some(sigDecontam))
        .select(col("id_b").as("doc_id")).localCheckpoint()
      lap("stage2b_gated_cosine")
      val afterCosine = decontam.join(nearDrop, Seq("doc_id"), "left_anti")
        .localCheckpoint()
      lap("stage2c_anti")
      val cleanedIds = graft.pipelines.CorpusClean
        .run(afterCosine, sigOpt = Some(sigDecontam)).select("doc_id")
      val kept = afterCosine.join(cleanedIds, Seq("doc_id"))
      val mixed = Text.stratifiedSample(kept, "doc_id", "lang",
        Map("en" -> 50, "de" -> 80), 100).cache()
      val ranked = Text.corpusShuffle(mixed, "doc_id", seed = "prep")
        .select(col("doc_id"), col("shuffle_rank"))
      val n = Text.chunk(mixed, "text", "doc_id", 128, 128)
        .join(ranked, Seq("doc_id"))
        .select(col("doc_id"), col("shuffle_rank"), col("chunk_id"), col("chunk"))
        .count()
      lap(s"stage3_clean_chunk(n=$n)")
      println(f"[prep] rep$rep TOTAL ${(System.nanoTime() - t0) / 1e9}%6.2f")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
