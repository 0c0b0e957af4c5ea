package graft.tools

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev harness: deterministically scale the sf0.1 testdata 10× to a
  * synthetic sf1 (VERDICT r6 item 2 — "prove the 2× bar beyond
  * sf0.1"). Each table is the union of `copies` key-shifted replicas
  * (stride 10M — far above every key space, and clear of the
  * entity-resolution demos' +2M/+4M derived keys), so FK integrity is
  * preserved copy-locally and the join/agg key distributions are the
  * sf0.1 distributions repeated — "10× more of the same".
  *
  * Documents get a per-copy VOCABULARY TAG on every non-stopword (the
  * quality-gate stopword list stays shared): replica shards are then
  * mutually non-duplicative — cross-copy shingle overlap is only
  * stopword runs — which models a corpus whose growth brings new
  * content, keeps stopword document frequencies growing ∝N (so the
  * tf·idf relative df cut still prunes them), and keeps each shard's
  * intra-shard dup/near-dup structure exactly sf0.1's. Verbatim
  * replication instead would make every document a 10-way exact dup —
  * a degenerate corpus that inflates every dedup family
  * quadratically by CONSTRUCTION, not by plan.
  *
  * Embeddings keep their vectors (ANN top-k just sees 10 tied copies;
  * ties break on id); events/orders/lineitem/customer/supplier/part
  * shift keys only; region/nation stay the shared dims.
  *
  * Usage: tools/run.sh graft.tools.ScaleUp [srcDir] [outDir] [copies] [stride]
  * `stride` must exceed the source's key space — the 10M default fits
  * the driver-generated SFs; re-scaling an already-scaled dir (e.g.
  * sf10 → sf100) needs one past ITS shifted keys (e.g. 10^10).
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/testdata/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val stride = args.lift(3).map(_.toLong).getOrElse(10000000L)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def wr(t: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
    wr("region", rd("region"))
    wr("nation", rd("nation"))
    def shifted(t: String, keys: Seq[String],
        extra: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = rd(t)
      wr(t, (0 until copies).map { k =>
        val s = keys.foldLeft(base)((d, c) =>
          d.withColumn(c, (col(c) + lit(k * stride)).cast(base.schema(c).dataType)))
        extra(s, k)
      }.reduce(_ unionByName _))
    }
    shifted("customer", Seq("c_custkey"))
    shifted("supplier", Seq("s_suppkey"))
    shifted("part", Seq("p_partkey"))
    shifted("orders", Seq("o_orderkey", "o_custkey"))
    shifted("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    shifted("events", Seq("event_id", "user_id"))
    shifted("embeddings", Seq("vec_id"))
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "for")
    shifted("documents", Seq("doc_id"), (d, k) =>
      if (k == 0) d
      else {
        // "_" separator keeps tags unambiguous under RECURSIVE scaling
        // (sf10 → sf100): bare digit suffixes collide across levels
        // ("word"+7 then +3 == "word"+73), silently making two shards
        // exact duplicates of each other.
        val tagged = array_join(transform(split(col("text"), " "),
          w => when(w.isin(stop: _*), w)
            .otherwise(concat(w, lit("_" + k)))), " ")
        d.withColumn("text", tagged)
          .withColumn("n_chars",
            length(col("text")).cast(d.schema("n_chars").dataType))
      })
    println(s"[scaleup] wrote ${copies}x of $src to $out")
    spark.stop()
  }
}
