package graft.tools

import graft.{GraftSession, Tables}
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Dev harness (VERDICT r12 item 3): measure the tf·idf cascade's
  * candidate-pair mass per decade — n_docs, exact-text classes,
  * intra-class pair mass (expansion-only under contraction), and the
  * rep-level MinHash candidate count (the `score+topk` stage's work
  * driver). Separates "the data got denser" (inherent cost ∝ measured
  * pair mass) from "the plan got worse" (wall grows faster than mass).
  * Usage: tools/run.sh graft.tools.CandMass <sfDir>...
  */
object CandMass {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val d = Tables(spark, dir).documents
      val cls = d.select(col("doc_id"), sha2(col("text"), 256).as("h"))
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("cn"))
        .localCheckpoint()
      val row = cls.agg(sum(col("cn")), count(lit(1)),
        sum(col("cn") * (col("cn") - 1))).head()
      val (nDocs, nCls, intra) =
        (row.getLong(0), row.getLong(1), row.getLong(2) / 2)
      val reps = d.join(cls.select(col("rep").as("doc_id")), Seq("doc_id"),
        "left_semi")
      val sig = Dedup.minhashSignature(reps, "text", "doc_id", 8)
      val cand = Dedup.minhashCandidates(sig, "doc_id", 8, 1).count()
      println(s"[candmass] dir=$dir n_docs=$nDocs n_classes=$nCls " +
        s"intra_pairs=$intra rep_lsh_cand_pairs=$cand " +
        f"cand_per_class=${cand.toDouble / nCls}%.2f")
    }
    spark.stop()
  }
}
