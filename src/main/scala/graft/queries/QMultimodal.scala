package graft.queries

import graft.Tables
import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Demo query + oracle for the multimodal binary-column plumbing
  * (SURVEY.md north star J4): documents' text is cast to its UTF-8
  * payload standing in for an image/audio blob; metadata extraction,
  * fake decode, and thumbnail slicing run as codegen'd expressions.
  * The batched mapPartitions decode path is unit-tested (Scala-side
  * stub, no SQL equivalent).
  */
object QMultimodal {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_multimodal_meta" -> ((s, dir) => {
      val media = Tables(s, dir).documents
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("bytes"))
      media.select(
        col("media_id"),
        Multimodal.byteLen(col("bytes")).as("byte_len"),
        Multimodal.fakeWidth(col("bytes")).as("width"),
        Multimodal.fakeHeight(col("bytes")).as("height"),
        octet_length(Multimodal.thumbnail(col("bytes"), 64)).cast("bigint").as("thumb_len"))
    }),

    // Frame sampling: 32-byte chunks, every 2nd kept — count + the md5
    // of the first sampled frame (content-addressed, engine-portable).
    "q_multimodal_frames" -> ((s, dir) => {
      val media = Tables(s, dir).documents
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("bytes"))
      val frames = Multimodal.sampleChunks(col("bytes"), chunkBytes = 32, stride = 2)
      media.select(
        col("media_id"),
        size(frames).cast("bigint").as("n_frames"),
        md5(element_at(frames, 1)).as("first_frame_md5"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id,
                CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
                CAST(CAST('0x' || substring(md5(text), 1, 8) AS BIGINT) % 1920 + 1 AS INT) AS width,
                CAST(CAST('0x' || substring(md5(reverse(text)), 1, 8) AS BIGINT) % 1080 + 1 AS INT) AS height,
                CAST(least(octet_length(encode(text)), 64) AS BIGINT) AS thumb_len
         FROM documents""",
    "q_multimodal_frames" ->
      """SELECT doc_id AS media_id,
                CAST((greatest(CAST(ceil(length(text) / 32.0) AS INT), 1) + 1) // 2 AS BIGINT) AS n_frames,
                md5(substring(text, 1, 32)) AS first_frame_md5
         FROM documents"""
  )
}
