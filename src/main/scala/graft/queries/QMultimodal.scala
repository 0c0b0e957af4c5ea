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

    // REAL binary-file ingest: deterministic BMP files on disk, read
    // through Spark's binaryFile source (the actual multimodal ingest
    // path — whole files as binary rows), REAL header parse in the
    // batched decode. The oracle restates the generator's arithmetic,
    // so a parser or ingest regression breaks the hash.
    "q_binary_ingest" -> ((s, dir) => {
      import s.implicits._
      val path = s"target/tmp/q_binary_ingest_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
      val d = new java.io.File(path)
      if (!d.exists()) {
        d.mkdirs()
        (0 until 20).foreach { i =>
          val b = new Array[Byte](54 + i) // header + i bytes of "pixel" padding
          b(0) = 'B'; b(1) = 'M'
          def le(off: Int, v: Int): Unit =
            (0 until 4).foreach(j => b(off + j) = ((v >> (8 * j)) & 0xff).toByte)
          le(14, 40); le(18, 100 + i); le(22, 50 + 2 * i)
          java.nio.file.Files.write(new java.io.File(d, f"media_$i%03d.bmp").toPath, b)
        }
      }
      val recs = s.read.format("binaryFile").load(path)
        .select(
          regexp_extract(col("path"), "media_(\\d+)\\.bmp", 1).cast("long").as("media_id"),
          col("content").as("bytes"))
        .as[Multimodal.MediaRecord]
      Multimodal.decodePartitions(recs).toDF()
        .select(col("media_id"), col("byte_len"), col("width"), col("height"))
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
    "q_binary_ingest" ->
      """SELECT CAST(range AS BIGINT) AS media_id,
                CAST(54 + range AS BIGINT) AS byte_len,
                CAST(100 + range AS INT) AS width,
                CAST(50 + 2 * range AS INT) AS height
         FROM range(20)""",
    "q_multimodal_frames" ->
      """SELECT doc_id AS media_id,
                CAST((greatest(CAST(ceil(length(text) / 32.0) AS INT), 1) + 1) // 2 AS BIGINT) AS n_frames,
                md5(substring(text, 1, 32)) AS first_frame_md5
         FROM documents"""
  )
}
