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
      // .done marker: the fixture loop is driver-side java.nio, so an
      // interrupted run leaves a partial file set a bare-dir gate would
      // silently accept (same hazard ADVICE flagged for psGraph)
      if (!new java.io.File(d, ".done").exists()) {
        d.mkdirs()
        (0 until 20).foreach { i =>
          val b = new Array[Byte](54 + i) // header + i bytes of "pixel" padding
          b(0) = 'B'; b(1) = 'M'
          def le(off: Int, v: Int): Unit =
            (0 until 4).foreach(j => b(off + j) = ((v >> (8 * j)) & 0xff).toByte)
          le(14, 40); le(18, 100 + i); le(22, 50 + 2 * i)
          java.nio.file.Files.write(new java.io.File(d, f"media_$i%03d.bmp").toPath, b)
        }
        java.nio.file.Files.write(new java.io.File(d, ".done").toPath, Array.empty[Byte])
      }
      val recs = s.read.format("binaryFile").load(path)
        .select(
          regexp_extract(col("path"), "media_(\\d+)\\.bmp", 1).cast("long").as("media_id"),
          col("content").as("bytes"))
        .as[Multimodal.MediaRecord]
      Multimodal.decodePartitions(recs).toDF()
        .select(col("media_id"), col("byte_len"), col("width"), col("height"))
    }),

    // REAL audio feature extraction: deterministic 16-bit PCM WAV files
    // on disk, ingested through binaryFile, chunk-walked, and reduced
    // to per-frame energies (sum of squared samples over 32-sample
    // frames — exact LONG math). The oracle restates the sample
    // generator's arithmetic, so a WAV-parse, frame-split, or energy
    // regression breaks the hash. File i holds 160+16i samples with
    // s(t) = (37i + 13t) mod 2048 - 1024; odd i leaves a partial frame
    // that must be DROPPED.
    "q_audio_energy" -> ((s, dir) => {
      import s.implicits._
      val path = s"target/tmp/q_audio_energy_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
      val d = new java.io.File(path)
      // .done marker: the fixture loop is driver-side java.nio, so an
      // interrupted run leaves a partial file set a bare-dir gate would
      // silently accept (same hazard ADVICE flagged for psGraph)
      if (!new java.io.File(d, ".done").exists()) {
        d.mkdirs()
        (0 until 10).foreach { i =>
          val n = 160 + 16 * i
          val dataBytes = 2 * n
          val b = java.nio.ByteBuffer.allocate(44 + dataBytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          b.put("RIFF".getBytes); b.putInt(36 + dataBytes); b.put("WAVE".getBytes)
          b.put("fmt ".getBytes); b.putInt(16)
          b.putShort(1); b.putShort(1) // PCM, mono
          b.putInt(16000); b.putInt(32000); b.putShort(2); b.putShort(16)
          b.put("data".getBytes); b.putInt(dataBytes)
          (0 until n).foreach(t => b.putShort(((37 * i + 13 * t) % 2048 - 1024).toShort))
          java.nio.file.Files.write(
            new java.io.File(d, f"audio_$i%03d.wav").toPath, b.array())
        }
        java.nio.file.Files.write(new java.io.File(d, ".done").toPath, Array.empty[Byte])
      }
      val recs = s.read.format("binaryFile").load(path)
        .select(
          regexp_extract(col("path"), "audio_(\\d+)\\.wav", 1).cast("long").as("media_id"),
          col("content").as("bytes"))
        .as[Multimodal.MediaRecord]
      Multimodal.audioFrameEnergies(recs, frameSamples = 32).toDF()
        .select(col("media_id"), col("frame_no"), col("energy"))
    }),

    // REAL image dedup: deterministic 16×16 24bpp BMPs on disk (files
    // 10–14 repeat files 0–4's pixel content), ingested via binaryFile
    // and PIXEL-WALKED to a 16-bit block-mean perceptual hash; equal
    // hashes group duplicates under a min-id canonical. The oracle
    // replays the pixel-generator arithmetic through the same
    // cross-multiplied integer block comparisons, so a stride, pixel
    // -offset, or bit-packing regression breaks the hash.
    "q_image_blockhash" -> ((s, dir) => {
      import s.implicits._
      val path = s"target/tmp/q_image_blockhash_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
      val d = new java.io.File(path)
      // .done marker: the fixture loop is driver-side java.nio, so an
      // interrupted run leaves a partial file set a bare-dir gate would
      // silently accept (same hazard ADVICE flagged for psGraph)
      if (!new java.io.File(d, ".done").exists()) {
        d.mkdirs()
        (0 until 15).foreach { i =>
          val w = 16; val h = 16; val stride = w * 3
          val b = java.nio.ByteBuffer.allocate(54 + stride * h)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          b.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
          b.putInt(0).putInt(54)           // reserved; pixel-array offset
          b.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER
          b.putShort(1).putShort(24)       // planes, bpp
          b.putInt(0).putInt(stride * h)
          b.putInt(2835).putInt(2835).putInt(0).putInt(0)
          val j = i % 10
          (0 until h).foreach { y =>
            (0 until w).foreach { x =>
              val v = ((j * 31 + y * 7 + x * 3) % 256).toByte
              b.put(v).put(v).put(v)
            }
          }
          java.nio.file.Files.write(
            new java.io.File(d, f"img_$i%03d.bmp").toPath, b.array())
        }
        java.nio.file.Files.write(new java.io.File(d, ".done").toPath, Array.empty[Byte])
      }
      val recs = s.read.format("binaryFile").load(path)
        .select(
          regexp_extract(col("path"), "img_(\\d+)\\.bmp", 1).cast("long").as("media_id"),
          col("content").as("bytes"))
        .as[Multimodal.MediaRecord]
      val hashed = recs
        .map(r => (r.media_id,
          Multimodal.Headers.bmpBlockHash(r.bytes).getOrElse(-1L)))
        .toDF("media_id", "hash16")
      hashed.withColumn("canon_id",
        min(col("media_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("hash16"))))
    }),

    // REAL compressed-image dedup: deterministic 16×16 8-bit RGB PNGs
    // on disk — zlib-DEFLATED scanlines with the FULL filter set
    // (row y uses filter y%5: None/Sub/Up/Average/Paeth), files 10–14
    // repeating files 0–4's pixel content — ingested via binaryFile,
    // INFLATED + UNFILTERED in pure JVM (Multimodal.Headers.pngGray),
    // and reduced to the 16-bit block-mean hash. A regression anywhere
    // in the codec (chunk walk, inflate, any of the five filter
    // inversions, channel stride) changes the decoded pixels and
    // breaks the hash against the oracle's generator-arithmetic replay.
    "q_png_blockhash" -> ((s, dir) => {
      import s.implicits._
      val path = s"target/tmp/q_png_blockhash_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
      val d = new java.io.File(path)
      if (!new java.io.File(d, ".done").exists()) {
        d.mkdirs()
        def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
          val crc = new java.util.zip.CRC32()
          crc.update(typ.getBytes("US-ASCII")); crc.update(data)
          java.nio.ByteBuffer.allocate(12 + data.length)
            .putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
            .putInt(crc.getValue.toInt).array()
        }
        (0 until 15).foreach { i =>
          val w = 16; val h = 16; val ch = 3
          val j = i % 10
          def pix(y: Int, x: Int): Int = (j * 37 + y * 5 + x * 11) % 256
          // filter-encode the scanlines: row y carries filter y%5, so
          // the decoder must invert all five reconstruction rules
          val raw = new Array[Byte]((w * ch + 1) * h)
          val prev = new Array[Int](w * ch)
          (0 until h).foreach { y =>
            val cur = Array.tabulate(w * ch)(k => pix(y, k / ch))
            val ft = y % 5
            raw(y * (w * ch + 1)) = ft.toByte
            (0 until w * ch).foreach { k =>
              val a = if (k >= ch) cur(k - ch) else 0
              val up = prev(k)
              val c = if (k >= ch) prev(k - ch) else 0
              val predicted = ft match {
                case 0 => 0
                case 1 => a
                case 2 => up
                case 3 => (a + up) >> 1
                case _ =>
                  val p = a + up - c
                  val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
                  if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
              }
              raw(y * (w * ch + 1) + 1 + k) = ((cur(k) - predicted) & 0xff).toByte
            }
            System.arraycopy(cur, 0, prev, 0, w * ch)
          }
          val defl = new java.util.zip.Deflater()
          defl.setInput(raw); defl.finish()
          val buf = new Array[Byte](raw.length + 64)
          val zlen = defl.deflate(buf); defl.end()
          val ihdr = java.nio.ByteBuffer.allocate(13)
            .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
            .put(0.toByte).put(0.toByte).put(0.toByte).array()
          val out = new java.io.ByteArrayOutputStream()
          out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
          out.write(chunk("IHDR", ihdr))
          out.write(chunk("IDAT", buf.take(zlen)))
          out.write(chunk("IEND", Array.empty[Byte]))
          java.nio.file.Files.write(
            new java.io.File(d, f"img_$i%03d.png").toPath, out.toByteArray)
        }
        java.nio.file.Files.write(new java.io.File(d, ".done").toPath, Array.empty[Byte])
      }
      val recs = s.read.format("binaryFile").load(path)
        .select(
          regexp_extract(col("path"), "img_(\\d+)\\.png", 1).cast("long").as("media_id"),
          col("content").as("bytes"))
        .as[Multimodal.MediaRecord]
      val hashed = recs
        .map(r => (r.media_id,
          Multimodal.Headers.pngBlockHash(r.bytes).getOrElse(-1L)))
        .toDF("media_id", "hash16")
      hashed.withColumn("canon_id",
        min(col("media_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("hash16"))))
    }),

    // REAL entropy-coded-image dedup — the DecoderStub retirement for
    // the last real format: deterministic baseline JPEGs on disk
    // (grayscale SOF0, canonical-Huffman DC categories + EOB-coded AC,
    // each 8×8 block a constant value with DC quant 8, so
    // dequant+IDCT reproduce the generator's pixels EXACTLY — the
    // lossless corner of a lossy codec, which is what lets a DuckDB
    // oracle replay decoded pixel content), files 10–14 repeating
    // files 0–4 — ingested via binaryFile, HUFFMAN-DECODED + IDCT'd in
    // pure JVM (Multimodal.Headers.jpegGray) and reduced to the 16-bit
    // block-mean hash. A regression anywhere in the scan decode
    // (marker walk, canonical code build, DC prediction, EXTEND,
    // byte unstuffing, dequant, IDCT, level shift) changes the pixels
    // and breaks the hash. The general AC path is cross-checked
    // against the JDK's independent ImageIO codec in OpsSpec.
    "q_jpeg_blockhash" -> ((s, dir) => {
      import s.implicits._
      val path = s"target/tmp/q_jpeg_blockhash_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
      val d = new java.io.File(path)
      if (!new java.io.File(d, ".done").exists()) {
        d.mkdirs()
        (0 until 15).foreach { i =>
          val j = i % 10
          def blockV(by: Int, bx: Int): Int = (j * 41 + by * 13 + bx * 29) % 256
          val bos = new java.io.ByteArrayOutputStream()
          def u8(v: Int): Unit = bos.write(v & 0xff)
          def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
          def marker(m: Int): Unit = { u8(0xff); u8(m) }
          marker(0xd8) // SOI
          // DQT 0: every entry 8 — DC = 8·(v−128)/8 = v−128 exactly
          marker(0xdb); u16(2 + 65); u8(0x00); (0 until 64).foreach(_ => u8(8))
          // SOF0: 8-bit grayscale 16×16, sampling 1×1
          marker(0xc0); u16(8 + 3); u8(8); u16(16); u16(16); u8(1)
          u8(1); u8(0x11); u8(0)
          // DHT DC 0: categories 0..8, all at code length 4 (canonical
          // codes 0000..1000 — never the all-ones code)
          marker(0xc4); u16(2 + 17 + 9); u8(0x00)
          (1 to 16).foreach(l => u8(if (l == 4) 9 else 0))
          (0 to 8).foreach(u8)
          // DHT AC 0: the single EOB symbol at length 1 (code "0")
          marker(0xc4); u16(2 + 17 + 1); u8(0x10)
          (1 to 16).foreach(l => u8(if (l == 1) 1 else 0))
          u8(0x00)
          // SOS, then the entropy segment: 4 DC-only blocks in raster
          // order, DC coded as a prediction DIFF (category + magnitude
          // bits), AC closed by EOB; 0xFF bytes stuffed, tail padded
          marker(0xda); u16(6 + 2); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)
          var acc = 0; var nb = 0
          def putBits(v: Int, n: Int): Unit = (n - 1 to 0 by -1).foreach { k =>
            acc = (acc << 1) | ((v >> k) & 1); nb += 1
            if (nb == 8) {
              bos.write(acc); if (acc == 0xff) bos.write(0x00); acc = 0; nb = 0
            }
          }
          var pred = 0
          for (by <- 0 until 2; bx <- 0 until 2) {
            val dc = blockV(by, bx) - 128
            val diff = dc - pred; pred = dc
            val s = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
            putBits(s, 4) // canonical DC code for category s IS s
            if (s > 0) putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
            putBits(0, 1) // EOB
          }
          while (nb != 0) putBits(1, 1) // 1-pad to byte boundary
          marker(0xd9) // EOI
          java.nio.file.Files.write(
            new java.io.File(d, f"img_$i%03d.jpg").toPath, bos.toByteArray)
        }
        java.nio.file.Files.write(new java.io.File(d, ".done").toPath, Array.empty[Byte])
      }
      val recs = s.read.format("binaryFile").load(path)
        .select(
          regexp_extract(col("path"), "img_(\\d+)\\.jpg", 1).cast("long").as("media_id"),
          col("content").as("bytes"))
        .as[Multimodal.MediaRecord]
      val hashed = recs
        .map(r => (r.media_id,
          Multimodal.Headers.jpegBlockHash(r.bytes).getOrElse(-1L)))
        .toDF("media_id", "hash16")
      hashed.withColumn("canon_id",
        min(col("media_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("hash16"))))
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
    "q_audio_energy" ->
      """WITH s AS (SELECT i.range AS media_id, t.range AS t,
                           (i.range * 37 + t.range * 13) % 2048 - 1024 AS v
                    FROM range(10) i CROSS JOIN range(304) t
                    WHERE t.range < 160 + 16 * i.range)
         SELECT media_id, CAST(t // 32 AS INT) AS frame_no,
                CAST(sum(v * v) AS BIGINT) AS energy
         FROM s
         WHERE t < ((160 + 16 * media_id) // 32) * 32
         GROUP BY 1, 2""",
    "q_png_blockhash" ->
      """WITH px AS (SELECT i.range AS media_id, y.range AS y, x.range AS x,
                            ((i.range % 10) * 37 + y.range * 5 + x.range * 11) % 256 AS v
                     FROM range(15) i CROSS JOIN range(16) y CROSS JOIN range(16) x),
          blk AS (SELECT media_id, (y // 4) * 4 + (x // 4) AS bi,
                         sum(v) AS bs, count(*) AS bc
                  FROM px GROUP BY 1, 2),
          tot AS (SELECT media_id, sum(v) AS ts, count(*) AS tp
                  FROM px GROUP BY 1),
          h AS (SELECT b.media_id,
                       CAST(sum(CASE WHEN bs * tp > ts * bc
                                     THEN 1 << bi ELSE 0 END) AS BIGINT) AS hash16
                FROM blk b JOIN tot t ON b.media_id = t.media_id
                GROUP BY 1)
         SELECT media_id, hash16,
                min(media_id) OVER (PARTITION BY hash16) AS canon_id
         FROM h""",
    "q_jpeg_blockhash" ->
      """WITH px AS (SELECT i.range AS media_id, y.range AS y, x.range AS x,
                            ((i.range % 10) * 41 + (y.range // 8) * 13 + (x.range // 8) * 29) % 256 AS v
                     FROM range(15) i CROSS JOIN range(16) y CROSS JOIN range(16) x),
          blk AS (SELECT media_id, (y // 4) * 4 + (x // 4) AS bi,
                         sum(v) AS bs, count(*) AS bc
                  FROM px GROUP BY 1, 2),
          tot AS (SELECT media_id, sum(v) AS ts, count(*) AS tp
                  FROM px GROUP BY 1),
          h AS (SELECT b.media_id,
                       CAST(sum(CASE WHEN bs * tp > ts * bc
                                     THEN 1 << bi ELSE 0 END) AS BIGINT) AS hash16
                FROM blk b JOIN tot t ON b.media_id = t.media_id
                GROUP BY 1)
         SELECT media_id, hash16,
                min(media_id) OVER (PARTITION BY hash16) AS canon_id
         FROM h""",
    "q_image_blockhash" ->
      """WITH px AS (SELECT i.range AS media_id, y.range AS y, x.range AS x,
                            ((i.range % 10) * 31 + y.range * 7 + x.range * 3) % 256 AS v
                     FROM range(15) i CROSS JOIN range(16) y CROSS JOIN range(16) x),
          blk AS (SELECT media_id, (y // 4) * 4 + (x // 4) AS bi,
                         sum(v) AS bs, count(*) AS bc
                  FROM px GROUP BY 1, 2),
          tot AS (SELECT media_id, sum(v) AS ts, count(*) AS tp
                  FROM px GROUP BY 1),
          h AS (SELECT b.media_id,
                       CAST(sum(CASE WHEN bs * tp > ts * bc
                                     THEN 1 << bi ELSE 0 END) AS BIGINT) AS hash16
                FROM blk b JOIN tot t ON b.media_id = t.media_id
                GROUP BY 1)
         SELECT media_id, hash16,
                min(media_id) OVER (PARTITION BY hash16) AS canon_id
         FROM h""",
    "q_multimodal_frames" ->
      """SELECT doc_id AS media_id,
                CAST((greatest(CAST(ceil(length(text) / 32.0) AS INT), 1) + 1) // 2 AS BIGINT) AS n_frames,
                md5(substring(text, 1, 32)) AS first_frame_md5
         FROM documents"""
  )
}
