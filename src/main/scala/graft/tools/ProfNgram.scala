package graft.tools

import graft.{GraftSession, Tables}
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Dev profiling harness for the n-gram Jaccard hot query (bench
  * outlier round 1: 31 s at sf0.1). Prints stage timings + shingle
  * bucket-size skew so optimization targets the real bottleneck.
  */
object ProfNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(32)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = Tables(spark, sfDir).documents
    println(s"[prof] docs=${docs.count()}")

    val sh = Dedup.shingles(docs, "text", "doc_id", 3)
      .select(col("doc_id"),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("bigint").as("sh_h"))
    time("shingle rows")(println("  n=" + sh.count()))
    val bucket = sh.groupBy("sh_h").count()
    time("bucket histogram") {
      bucket.select(
        count(lit(1)).as("distinct_sh"),
        max(col("count")).as("max_bucket"),
        sum(col("count") * (col("count") - 1) / 2).as("total_pairs_emitted"))
        .show(false)
      bucket.orderBy(desc("count")).show(20, false)
    }
    time("full q_ngram_jaccard") {
      println("  rows=" + Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 1, 5).count())
    }
    spark.catalog.clearCache()
    time("full q_ngram_jaccard warm") {
      println("  rows=" + Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 1, 5).count())
    }
    spark.stop()
  }
}
