package graft.pipelines

import graft.ops.{Dedup, Text}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data cleaning chain — the composition the
  * north-star LLM pipeline runs at 100 TB:
  *
  *   1. exact dedup (content digest, keep lowest id)
  *   2. near-dup removal via MinHash+LSH: for every candidate pair
  *      (a < b) among survivors, drop b — a deterministic pairwise rule
  *      (not a transitive closure: b's own pairs are judged against the
  *      already-kept a's, which matches the streaming-friendly
  *      "first-seen wins" production policy)
  *   3. quality gate: token-count band + function-word ratio floor
  *
  * Scale shape: stage 1 shuffles digests (not text); stage 2's only
  * join is the LSH band-bucket equi-join; stage 3 is a scan. Nothing
  * here is quadratic in corpus size.
  */
object CorpusClean {

  def run(documents: DataFrame,
      minhashSeeds: Int = 8,
      minWords: Int = 20, maxWords: Int = 1000,
      minStopwordRatio: Double = 0.02): DataFrame = {
    // 1 — exact dedup; cached: the survivor set feeds shingling, the
    // anti-join, and the final projection (3 consumers)
    val survivors = Dedup.exactByHash(documents, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))
      .join(documents, Seq("doc_id"))
      .cache()

    // 2 — near-dup candidates among survivors; drop the higher id.
    // Signatures are computed map-side by the native MinHash kernel —
    // the only shuffle in this stage is the band-bucket equi-join.
    val sig = Dedup.minhashSignature(survivors, "text", "doc_id", minhashSeeds)
    val dropIds = Dedup.minhashCandidates(sig, "doc_id", bands = minhashSeeds, rowsPerBand = 1)
      .select(col("id_b").as("doc_id")).distinct()
    val nearDeduped = survivors.join(dropIds, Seq("doc_id"), "left_anti")

    // 3 — quality gate
    nearDeduped
      .withColumn("n_words", size(Text.tokens(col("text"))).cast("bigint"))
      .withColumn("stopword_ratio", Text.stopwordRatio(col("text")))
      .filter(col("n_words") >= minWords && col("n_words") <= maxWords
        && col("stopword_ratio") >= minStopwordRatio)
      .select("doc_id", "lang", "n_words", "stopword_ratio")
  }
}
