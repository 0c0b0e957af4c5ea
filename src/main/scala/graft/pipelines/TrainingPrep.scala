package graft.pipelines

import graft.ops.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full training-data preparation story, composed end to end from
  * the individually-verified operators — what the north-star LLM
  * pipeline actually runs over a raw 100 TB corpus:
  *
  *   1. [[CorpusClean]]: exact dedup → LSH near-dup removal → quality
  *      gate (each stage's scale shape documented there)
  *   2. language rebalancing: deterministic per-stratum keep rates
  *      ([[Text.stratifiedSample]] — map-only)
  *   3. reproducible global shuffle ([[Text.corpusShuffle]] — banded
  *      rank, no single-task sort)
  *   4. context-window chunking ([[Text.chunk]] — one explode)
  *
  * Output: one row per training chunk, addressed by (shuffle_rank,
  * chunk_id) — the exact read order a trainer consumes. Every stage is
  * deterministic, so the whole composition is oracle-checkable and
  * re-runs are byte-stable.
  */
object TrainingPrep {

  def run(documents: DataFrame, seed: String = "prep",
      chunkSize: Int = 128): DataFrame = {
    val cleanedIds = CorpusClean.run(documents).select("doc_id")
    val kept = documents.join(cleanedIds, Seq("doc_id"))
    // cached: both the rank assignment and the chunker consume it —
    // without this the whole cleaning subtree executes twice. (At
    // 100 TB, persist the accepted set to storage here instead.)
    val mixed = Text.stratifiedSample(kept, "doc_id", "lang",
      Map("en" -> 50, "de" -> 80), 100).cache()
    val ranked = Text.corpusShuffle(mixed, "doc_id", seed)
      .select(col("doc_id"), col("shuffle_rank"))
    Text.chunk(mixed, "text", "doc_id", chunkSize, chunkSize)
      .join(ranked, Seq("doc_id"))
      .select(col("doc_id"), col("shuffle_rank"), col("chunk_id"), col("chunk"))
  }
}
