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

  /** `tap` is the observability seam: each stage's frame passes through
    * it under a stable name, so callers can attach `observe` counters
    * (see [[runAudited]]) or lineage hooks without a second pass over
    * the data. The default is the identity — zero plan change.
    */
  /** `sigOpt`: a precomputed (doc_id, sig) MinHash signature frame
    * covering at least the input documents — pipelines that already
    * sketched the corpus upstream (TrainingPrep.runV2's gate stage)
    * pass it so the LSH stage restricts it by semi-join instead of
    * re-running the kernel over the text. Signatures are pure
    * functions of the text, so results are identical either way.
    */
  def run(documents: DataFrame,
      minhashSeeds: Int = 8,
      minWords: Int = 20, maxWords: Int = 1000,
      minStopwordRatio: Double = 0.02,
      tap: (String, DataFrame) => DataFrame = (_, df) => df,
      sigOpt: Option[DataFrame] = None): DataFrame = {
    // 1 — exact dedup; materialized once: the survivor set feeds
    // shingling, the anti-join, and the final projection (3 consumers).
    // localCheckpoint, not cache(): checkpoint blocks die with the RDD
    // reference, cache() entries stay CacheManager-pinned per call.
    val survivors = tap("survivors", Dedup.exactByHash(documents, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))
      .join(documents, Seq("doc_id")))
      .localCheckpoint()

    // 2 — near-dup candidates among survivors; drop the higher id.
    // Signatures are computed map-side by the native MinHash kernel —
    // the only shuffle in this stage is the band-bucket equi-join.
    val sig = sigOpt
      .map(_.join(survivors.select(col("doc_id")), Seq("doc_id"), "left_semi"))
      .getOrElse(Dedup.minhashSignature(survivors, "text", "doc_id", minhashSeeds))
    val dropIds = Dedup.minhashCandidates(sig, "doc_id", bands = minhashSeeds, rowsPerBand = 1)
      .select(col("id_b").as("doc_id")).distinct()
    val nearDeduped = tap("near_deduped",
      survivors.join(dropIds, Seq("doc_id"), "left_anti"))

    // 3 — quality gate
    tap("emitted", nearDeduped
      .withColumn("n_words", size(Text.tokens(col("text"))).cast("bigint"))
      .withColumn("stopword_ratio", Text.stopwordRatio(col("text")))
      .filter(col("n_words") >= minWords && col("n_words") <= maxWords
        && col("stopword_ratio") >= minStopwordRatio)
      .select("doc_id", "lang", "n_words", "stopword_ratio"))
  }

  /** [[run]] with per-stage row counters attached via `observe`: the
    * counts ride the SAME action that materializes the output (Spark's
    * CollectMetrics — accumulator-backed, no extra job, exactly what a
    * production run ships to its metrics sink). After any action on the
    * returned frame, the second element yields stage -> rows.
    */
  def runAudited(documents: DataFrame,
      minhashSeeds: Int = 8,
      minWords: Int = 20, maxWords: Int = 1000,
      minStopwordRatio: Double = 0.02): (DataFrame, () => Map[String, Long]) = {
    val observations = scala.collection.mutable.Map.empty[String, org.apache.spark.sql.Observation]
    val out = run(documents, minhashSeeds, minWords, maxWords, minStopwordRatio,
      tap = (name, df) => {
        val o = org.apache.spark.sql.Observation(s"corpus_clean_$name")
        observations(name) = o
        df.observe(o, count(lit(1)).as("rows"))
      })
    (out, () => observations.map { case (name, o) =>
      name -> o.get("rows").asInstanceOf[Long]
    }.toMap)
  }
}
