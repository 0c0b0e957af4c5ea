package graft.ops

import org.apache.spark.sql.{Column, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing — SURVEY.md north star J4.
  *
  * Design: image/audio/video travel as opaque `binary` columns with
  * typed metadata alongside. The Spark-side machinery (schemas,
  * batched partition processing, metadata extraction expressions) is
  * real and tested; the actual codec calls are STUBBED (this container
  * has no image/audio libraries) behind [[DecoderStub]] — a
  * deterministic fake keyed on content hash, so tests have stable
  * expectations. Swap [[DecoderStub.decode]] for a real codec (e.g.
  * JNI/ffmpeg) without touching any plumbing.
  *
  * Scale notes: binary payloads make rows wide — partition sizing must
  * come from `spark.sql.files.maxPartitionBytes`, not row counts, and
  * the batched `mapPartitions` path amortizes per-batch codec setup
  * exactly the way a Python `mapInPandas` batch would.
  */
object Multimodal {

  /** Typed record for a media row: payload + extracted metadata. */
  final case class MediaRecord(media_id: Long, bytes: Array[Byte])
  final case class DecodedMeta(media_id: Long, byte_len: Long, width: Int, height: Int, ok: Boolean)

  /** Columnar (codegen'd) metadata extraction — no UDF: byte length and
    * a deterministic content-hash-derived fake width/height standing in
    * for a real header parse.
    */
  def byteLen(bytes: Column): Column = octet_length(bytes).cast("bigint")
  def fakeWidth(bytes: Column): Column = (Text.md5Int(bytes) % 1920 + 1).cast("int")
  def fakeHeight(bytes: Column): Column = (Text.md5Int(reverse(bytes)) % 1080 + 1).cast("int")

  /** "Resize"/frame-sample stub at the column level: a prefix slice of
    * the payload — the real operation would be a codec call; the
    * dataflow (binary in, smaller binary out) is identical.
    */
  def thumbnail(bytes: Column, nBytes: Int): Column = substring(bytes, 1, nBytes)

  /** Frame/chunk sampling at the column level: split the payload into
    * fixed-size chunks and keep every `stride`-th one — the dataflow of
    * video frame-sampling or audio windowing (binary in, array of
    * smaller binaries out), with the codec boundary stubbed as byte
    * slicing. One codegen'd expression; the row never leaves the scan
    * task.
    */
  def sampleChunks(bytes: Column, chunkBytes: Int, stride: Int): Column = {
    val nChunks = ceil(octet_length(bytes).cast("double") / chunkBytes).cast("int")
    filter(
      transform(sequence(lit(0), greatest(nChunks - 1, lit(0))),
        i => substring(bytes, i * chunkBytes + 1, lit(chunkBytes))),
      (_, i) => i % stride === 0)
  }

  /** REAL header parsers for the formats that need no codec library —
    * pure-JVM byte-layout reads, proving the decode seam with actual
    * header bytes (the compressed-codec formats stay on [[DecoderStub]]
    * until a codec lib is linkable).
    */
  object Headers {
    private def le16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], off: Int, s: String): Boolean =
      b.length >= off + 4 && (0 until 4).forall(i => b(off + i) == s.charAt(i).toByte)

    /** BMP: 'BM' magic; BITMAPINFOHEADER width/height as signed LE32 at
      * offsets 18/22 (height negative = top-down rows; dimension is the
      * magnitude).
      */
    def parseBmp(b: Array[Byte]): Option[(Int, Int)] =
      if (b.length >= 26 && b(0) == 'B'.toByte && b(1) == 'M'.toByte)
        Some((le32(b, 18), math.abs(le32(b, 22))))
      else None

    final case class WavMeta(channels: Int, sampleRateHz: Int, bitsPerSample: Int, dataBytes: Long)

    /** WAV: RIFF/WAVE container; walk the chunk list (fmt may not be
      * at the canonical offset if LIST/fact chunks precede it) and read
      * the PCM format fields + data payload size.
      */
    def parseWav(b: Array[Byte]): Option[WavMeta] = {
      if (!(tag(b, 0, "RIFF") && tag(b, 8, "WAVE"))) return None
      var off = 12
      var fmt: Option[(Int, Int, Int)] = None
      var dataBytes = -1L
      var corrupt = false
      while (!corrupt && off + 8 <= b.length && (fmt.isEmpty || dataBytes < 0)) {
        val size = le32(b, off + 4)
        if (tag(b, off, "fmt ") && off + 24 <= b.length)
          fmt = Some((le16(b, off + 10), le32(b, off + 12), le16(b, off + 22)))
        else if (tag(b, off, "data"))
          dataBytes = size.toLong & 0xffffffffL
        // a hostile negative chunk size would walk off backwards
        // (negative-offset reads / infinite loop): treat as corrupt
        if (size < 0) corrupt = true
        else off += 8 + size + (size & 1) // chunks are word-aligned
      }
      if (corrupt) return None
      fmt.map { case (ch, rate, bits) => WavMeta(ch, rate, bits, math.max(0L, dataBytes)) }
    }

    /** PNG: 8-byte signature, then the IHDR chunk (first by spec) with
      * big-endian width/height at offsets 16/20.
      */
    def parsePng(b: Array[Byte]): Option[(Int, Int)] = {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      def be32(off: Int): Int =
        ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
          ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
      if (b.length >= 24 && (0 until 8).forall(i => b(i) == sig(i)) && tag(b, 12, "IHDR"))
        Some((be32(16), be32(20)))
      else None
    }

    /** REAL compressed-image decode for 8-bit non-interlaced PNG
      * (grayscale / RGB / RGBA): chunk-walk to IHDR, concatenate the
      * IDAT zlib stream, inflate it with the JDK's zlib, and undo the
      * per-scanline filters (None/Sub/Up/Average/Paeth — the full
      * filter set). Returns (width, height, first-channel pixel values
      * in stored top-down row order). This is an actual decompressing
      * codec in pure JVM — only bit depths/color types outside the
      * 8-bit gray/RGB/RGBA family and interlaced streams remain the
      * [[DecoderStub]]'s territory.
      */
    def pngGray(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      if (b.length < 8 || !(0 until 8).forall(i => b(i) == sig(i))) return None
      def be32(off: Int): Int =
        ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
          ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
      var off = 8
      var w = 0; var h = 0; var channels = 0
      val idat = new java.io.ByteArrayOutputStream()
      var ok = true; var done = false
      while (ok && !done && off + 12 <= b.length) {
        val len = be32(off)
        if (len < 0 || off.toLong + 12 + len > b.length) ok = false
        else {
          if (tag(b, off + 4, "IHDR")) {
            if (len < 13) ok = false
            else {
              w = be32(off + 8); h = be32(off + 12)
              val depth = b(off + 16) & 0xff
              val ct = b(off + 17) & 0xff
              val interlace = b(off + 20) & 0xff
              channels = ct match { case 0 => 1; case 2 => 3; case 6 => 4; case _ => 0 }
              if (depth != 8 || channels == 0 || interlace != 0 ||
                  w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) ok = false
            }
          } else if (tag(b, off + 4, "IDAT")) idat.write(b, off + 8, len)
          else if (tag(b, off + 4, "IEND")) done = true
          off += 12 + len
        }
      }
      if (!ok || w == 0 || idat.size == 0) return None
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      val rowBytes = w * channels
      val raw = new Array[Byte]((rowBytes + 1) * h)
      try {
        var n = 0
        while (n < raw.length && !inf.finished()) {
          val k = inf.inflate(raw, n, raw.length - n)
          // ANY zero-progress state short of finished() is a decode
          // failure: needsInput() = truncated stream, needsDictionary()
          // = FDICT preset dictionary (which this decoder never
          // supplies — without the check the loop would spin forever
          // on a hostile stream, hanging the executor task).
          if (k == 0) return None
          n += k
        }
        if (n < raw.length) return None
      } catch { case _: java.util.zip.DataFormatException => return None }
      finally inf.end()
      val px = new Array[Int](w * h)
      val cur = new Array[Int](rowBytes)
      val prev = new Array[Int](rowBytes)
      var y = 0
      while (y < h) {
        val base = y * (rowBytes + 1)
        val ft = raw(base) & 0xff
        if (ft > 4) return None
        var i = 0
        while (i < rowBytes) {
          val x = raw(base + 1 + i) & 0xff
          val a = if (i >= channels) cur(i - channels) else 0
          val up = prev(i)
          val c = if (i >= channels) prev(i - channels) else 0
          val rec = ft match {
            case 0 => x
            case 1 => x + a
            case 2 => x + up
            case 3 => x + ((a + up) >> 1)
            case _ => // Paeth
              val p = a + up - c
              val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
              x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          }
          cur(i) = rec & 0xff
          i += 1
        }
        var xx = 0
        while (xx < w) { px(y * w + xx) = cur(xx * channels); xx += 1 }
        System.arraycopy(cur, 0, prev, 0, rowBytes)
        y += 1
      }
      Some((w, h, px))
    }

    /** [[bmpBlockHash]]'s 16-bit block-mean hash over any decoded gray
      * plane: cross-multiplied exact-integer block comparisons, rows in
      * stored (top-down) order. Shared by the PNG and JPEG paths.
      */
    private def grayBlockHash16(w: Int, h: Int, px: Array[Int]): Long = {
      val bs = new Array[Long](16)
      val bc = new Array[Long](16)
      var ts = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = px(y * w + x)
          val bi = (y * 4 / h) * 4 + (x * 4 / w)
          bs(bi) += v; bc(bi) += 1; ts += v
          x += 1
        }
        y += 1
      }
      val tp = w.toLong * h
      var hash = 0L
      var i = 0
      while (i < 16) {
        if (bs(i) * tp > ts * bc(i)) hash |= (1L << i)
        i += 1
      }
      hash
    }

    /** 16-bit block-mean perceptual hash over a DECODED PNG
      * ([[pngGray]] — real inflate + unfilter).
      */
    def pngBlockHash(b: Array[Byte]): Option[Long] =
      pngGray(b).map { case (w, h, px) => grayBlockHash16(w, h, px) }

    /** 16-bit block-mean perceptual hash over a DECODED baseline JPEG
      * ([[jpegGray]] — real Huffman + dequant + IDCT).
      */
    def jpegBlockHash(b: Array[Byte]): Option[Long] =
      jpegGray(b).map { case (w, h, px) => grayBlockHash16(w, h, px) }

    // ---- baseline JPEG decode (the round-9 DecoderStub retirement) ----

    /** JPEG entropy-segment bit reader: MSB-first bits with 0xFF00
      * byte-unstuffing; any raw marker byte (or EOF) reads as -1, which
      * every caller treats as a decode failure — no spin states.
      */
    private final class JpegBits(b: Array[Byte], var pos: Int) {
      private var cur = 0
      private var nbits = 0
      def byteAlign(): Unit = nbits = 0
      def bit(): Int = {
        if (nbits == 0) {
          if (pos >= b.length) return -1
          val v = b(pos) & 0xff
          pos += 1
          if (v == 0xff) {
            if (pos >= b.length) return -1
            if ((b(pos) & 0xff) == 0x00) pos += 1 // stuffed byte
            else { pos -= 1; return -1 }          // real marker: stop
          }
          cur = v; nbits = 8
        }
        nbits -= 1
        (cur >> nbits) & 1
      }
      def bits(n: Int): Int = {
        var v = 0
        var i = 0
        while (i < n) {
          val x = bit(); if (x < 0) return -1
          v = (v << 1) | x; i += 1
        }
        v
      }
    }

    /** Canonical Huffman table from a DHT segment's (counts, values):
      * the standard minCode/maxCode/valPtr walk, one bit per step, at
      * most 16 steps — bounded by construction.
      */
    private final class JpegHuff(counts: Array[Int], vals: Array[Int]) {
      private val minCode = new Array[Int](17)
      private val maxCode = Array.fill(17)(-1)
      private val valPtr = new Array[Int](17)
      locally {
        var code = 0; var k = 0; var l = 1
        while (l <= 16) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1); k += counts(l - 1)
          if (counts(l - 1) > 0) maxCode(l) = code - 1
          code <<= 1
          l += 1
        }
      }
      def decode(r: JpegBits): Int = {
        var code = 0
        var l = 0
        while (l < 16) {
          val bt = r.bit(); if (bt < 0) return -1
          code = (code << 1) | bt
          l += 1
          if (code <= maxCode(l)) return vals(valPtr(l) + code - minCode(l))
        }
        -1
      }
    }

    /** Natural position of zigzag index k (ITU T.81 figure 5). */
    private val JpegZigzag: Array[Int] = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

    /** IDCT basis M(u)(x) = C(u)/2 · cos((2x+1)uπ/16). */
    private val JpegIdctM: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
      val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
    }

    /** T.81 EXTEND: map an S-bit magnitude code to its signed value. */
    private def jpegExtend(v: Int, s: Int): Int =
      if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

    /** REAL baseline JPEG decode (SOF0 sequential DCT, Huffman, 8-bit):
      * marker walk → DQT/DHT/SOF0/SOS parse → entropy decode (DC
      * prediction, AC run/size with ZRL/EOB, restart markers, 0xFF00
      * unstuffing) → dequant → separable double IDCT → level shift.
      * Returns the LUMA plane as gray pixels: supported frames are
      * single-component grayscale or all-1×1-sampling (4:4:4) color —
      * progressive (SOF2), arithmetic coding, 12-bit precision, and
      * subsampled chroma return None (the stub's remaining territory).
      * The IDCT rounds half-up off exact double sums, pixel-exact for
      * DC-only blocks (the oracle fixture contract) and inside the
      * spec's IDCT tolerance generally (OpsSpec cross-checks the AC
      * path against the JDK's independent ImageIO codec).
      */
    def jpegGray(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
      def be16(off: Int): Int = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
      val qt = Array.ofDim[Int](4, 64)
      val dcT = new Array[JpegHuff](4)
      val acT = new Array[JpegHuff](4)
      var w = 0; var h = 0; var nComp = 0
      val compId = new Array[Int](3)
      val compQ = new Array[Int](3)
      val compDc = new Array[Int](3)
      val compAc = new Array[Int](3)
      var restart = 0
      var off = 2
      while (off + 4 <= b.length) {
        if ((b(off) & 0xff) != 0xff) return None
        var m = b(off + 1) & 0xff
        while (m == 0xff && off + 2 < b.length) { off += 1; m = b(off + 1) & 0xff }
        // the fill-byte walk may have consumed the outer guard's
        // headroom: a buffer ending in a run of 0xFF must map to None,
        // not an out-of-bounds read (ADVICE r9 — hostile-input contract)
        if (off + 4 > b.length) return None
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) off += 2
        else if (m == 0xd9) return None // EOI before any scan
        else {
          val len = be16(off + 2)
          if (len < 2 || off + 2 + len > b.length) return None
          val p = off + 4
          m match {
            case 0xdb => // DQT (possibly several tables per segment)
              var q = p
              while (q < off + 2 + len) {
                if (q + 65 > off + 2 + len) return None
                val pq = (b(q) & 0xff) >> 4; val tq = (b(q) & 0xff) & 0xf
                if (pq != 0 || tq > 3) return None // 8-bit tables only
                var i = 0
                while (i < 64) { qt(tq)(JpegZigzag(i)) = b(q + 1 + i) & 0xff; i += 1 }
                q += 65
              }
            case 0xc4 => // DHT (possibly several tables per segment)
              var q = p
              while (q < off + 2 + len) {
                if (q + 17 > off + 2 + len) return None
                val tc = (b(q) & 0xff) >> 4; val th = (b(q) & 0xff) & 0xf
                if (tc > 1 || th > 3) return None
                val counts = Array.tabulate(16)(i => b(q + 1 + i) & 0xff)
                val n = counts.sum
                if (q + 17 + n > off + 2 + len) return None
                val vals = Array.tabulate(n)(i => b(q + 17 + i) & 0xff)
                val t = new JpegHuff(counts, vals)
                if (tc == 0) dcT(th) = t else acT(th) = t
                q += 17 + n
              }
            case 0xc0 => // SOF0 — baseline sequential
              if (len < 8 || (b(p) & 0xff) != 8) return None
              h = be16(p + 1); w = be16(p + 3); nComp = b(p + 5) & 0xff
              if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
              if ((nComp != 1 && nComp != 3) || len < 8 + 3 * nComp) return None
              var i = 0
              while (i < nComp) {
                val base = p + 6 + 3 * i
                compId(i) = b(base) & 0xff
                if ((b(base + 1) & 0xff) != 0x11) return None // 4:4:4 only
                compQ(i) = (b(base + 2) & 0xff) & 0x3
                i += 1
              }
            case mm if mm >= 0xc1 && mm <= 0xcf && mm != 0xc4 && mm != 0xc8 && mm != 0xcc =>
              return None // progressive/extended/lossless → stub
            case 0xdd =>
              if (len < 4) return None
              restart = be16(p)
            case 0xda => // SOS — decode the scan and return
              if (nComp == 0 || w == 0) return None
              // len == 2 would put p one past the segment (and possibly
              // the buffer) before the 6 + 2·ns check runs (ADVICE r9)
              if (len < 3) return None
              val ns = b(p) & 0xff
              if (ns != nComp || len < 6 + 2 * ns) return None
              var i = 0
              while (i < ns) {
                val cs = b(p + 1 + 2 * i) & 0xff
                val ci = compId.indexOf(cs)
                if (ci < 0 || ci >= nComp) return None
                compDc(ci) = ((b(p + 2 + 2 * i) & 0xff) >> 4) & 0x3
                compAc(ci) = (b(p + 2 + 2 * i) & 0xff) & 0x3
                i += 1
              }
              var c = 0
              while (c < nComp) {
                if (dcT(compDc(c)) == null || acT(compAc(c)) == null) return None
                c += 1
              }
              return jpegScan(b, off + 2 + len, w, h, nComp,
                qt, dcT, acT, compQ, compDc, compAc, restart)
            case _ => // APPn / COM / others: skip
          }
          off += 2 + len
        }
      }
      None // never reached a scan
    }

    /** The SOS entropy-decode loop of [[jpegGray]]: raster MCUs (one
      * 8×8 block per component at 4:4:4), luma blocks IDCT'd straight
      * into the output plane, chroma blocks decoded and discarded (the
      * bit stream must still be walked). Any malformed state — bad
      * Huffman code, AC index past 63, missing restart marker — maps
      * to None, never a spin or a throw.
      */
    private def jpegScan(b: Array[Byte], scanStart: Int, w: Int, h: Int,
        nComp: Int, qt: Array[Array[Int]], dcT: Array[JpegHuff],
        acT: Array[JpegHuff], compQ: Array[Int], compDc: Array[Int],
        compAc: Array[Int], restart: Int): Option[(Int, Int, Array[Int])] = {
      val mcusX = (w + 7) / 8
      val mcusY = (h + 7) / 8
      val out = new Array[Int](w * h)
      val r = new JpegBits(b, scanStart)
      val dcPred = new Array[Int](nComp)
      val coef = new Array[Int](64)
      val tmp = new Array[Double](64)
      var mcu = 0
      val total = mcusX * mcusY
      while (mcu < total) {
        if (restart > 0 && mcu > 0 && mcu % restart == 0) {
          r.byteAlign()
          if (r.pos + 2 > b.length || (b(r.pos) & 0xff) != 0xff ||
              ((b(r.pos + 1) & 0xff) & 0xf8) != 0xd0) return None
          r.pos += 2
          java.util.Arrays.fill(dcPred, 0)
        }
        var c = 0
        while (c < nComp) {
          java.util.Arrays.fill(coef, 0)
          val s = dcT(compDc(c)).decode(r)
          if (s < 0 || s > 11) return None
          if (s > 0) {
            val v = r.bits(s); if (v < 0) return None
            dcPred(c) += jpegExtend(v, s)
          }
          coef(0) = dcPred(c) * qt(compQ(c))(0)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = acT(compAc(c)).decode(r)
            if (rs < 0) return None
            val run = rs >> 4; val size = rs & 0xf
            if (size == 0) {
              if (run == 15) { // ZRL: 16 zeros, something must follow
                k += 16
                if (k > 63) return None // would exit mid-block, desynced
              } else eob = true
            } else {
              k += run
              if (k > 63) return None
              val v = r.bits(size); if (v < 0) return None
              val nat = JpegZigzag(k)
              coef(nat) = jpegExtend(v, size) * qt(compQ(c))(nat)
              k += 1
            }
          }
          if (c == 0) { // luma → gray output; chroma decoded + dropped
            // separable IDCT: rows of coef through M, then columns
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                var acc = 0.0
                var u = 0
                while (u < 8) { acc += JpegIdctM(u)(x) * coef(y * 8 + u); u += 1 }
                tmp(y * 8 + x) = acc
                x += 1
              }
              y += 1
            }
            val px0 = (mcu % mcusX) * 8
            val py0 = (mcu / mcusX) * 8
            var yy = 0
            while (yy < 8 && py0 + yy < h) {
              var xx = 0
              while (xx < 8 && px0 + xx < w) {
                var acc = 0.0
                var v = 0
                while (v < 8) { acc += JpegIdctM(v)(yy) * tmp(v * 8 + xx); v += 1 }
                val pix = math.round(acc).toInt + 128
                out((py0 + yy) * w + (px0 + xx)) =
                  if (pix < 0) 0 else if (pix > 255) 255 else pix
                xx += 1
              }
              yy += 1
            }
          }
          c += 1
        }
        mcu += 1
      }
      Some((w, h, out))
    }

    /** JPEG: marker walk from SOI; dimensions live in the first SOF
      * frame header (height/width as BE16 at payload offsets 3/5).
      * Handles fill bytes and the standalone markers (TEM/RSTn) that
      * carry no length field; gives up at SOS — a stream whose SOF
      * didn't precede its scan data is malformed for our purposes.
      */
    def parseJpeg(b: Array[Byte]): Option[(Int, Int)] = {
      def be16(off: Int): Int = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
      var off = 2
      while (off + 4 <= b.length) {
        if ((b(off) & 0xff) != 0xff) return None // desynced marker stream
        var m = b(off + 1) & 0xff
        while (m == 0xff && off + 2 < b.length) { off += 1; m = b(off + 1) & 0xff }
        if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) off += 2
        else if (m == 0xd9 || m == 0xda) return None // EOI / scan before SOF
        else {
          val len = be16(off + 2)
          if (len < 2 || off + 2 + len > b.length) return None
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof)
            return if (len >= 7) Some((be16(off + 7), be16(off + 5))) else None
          off += 2 + len
        }
      }
      None
    }

    /** REAL audio decode for 16-bit PCM WAV: locate the data chunk and
      * compute the RMS amplitude of the little-endian samples — actual
      * signal math in pure JVM, the feature-extraction step the Python
      * reference would do with an audio lib. Non-PCM/non-16-bit
      * payloads return None (the stub's territory).
      */
    def wavRms16(b: Array[Byte]): Option[Double] =
      wavSamples16(b).map { samples =>
        if (samples.isEmpty) 0.0
        else {
          var acc = 0.0
          var i = 0
          while (i < samples.length) {
            val s = samples(i).toDouble
            acc += s * s
            i += 1
          }
          math.sqrt(acc / samples.length)
        }
      }

    /** The 16-bit PCM samples of a WAV blob: chunk-walk to the data
      * chunk, decode the little-endian int16 stream. The shared
      * extraction under [[wavRms16]] and the frame-level features.
      */
    def wavSamples16(b: Array[Byte]): Option[Array[Short]] = {
      if (!(tag(b, 0, "RIFF") && tag(b, 8, "WAVE"))) return None
      parseWav(b).filter(_.bitsPerSample == 16).flatMap { _ =>
        // Chunk sizes come from untrusted 32-bit fields: a negative
        // size would walk `off` backwards (infinite loop) and a
        // negative data size would blow up Array allocation — clamp
        // both so malformed payloads degrade to None, per contract.
        var off = 12
        var corrupt = false
        while (!corrupt && off + 8 <= b.length && !tag(b, off, "data")) {
          val sz = le32(b, off + 4)
          if (sz < 0) corrupt = true else off += 8 + sz + (sz & 1)
        }
        if (corrupt || off + 8 > b.length) None
        else {
          val n = math.max(0, math.min(le32(b, off + 4), b.length - off - 8)) / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) = le16(b, off + 8 + 2 * i).toShort
            i += 1
          }
          Some(out)
        }
      }
    }

    /** REAL image feature extraction for uncompressed 24bpp BMP: walk
      * the pixel array (4-byte-padded rows, blue channel as the gray
      * proxy — our fixtures write equal channels; a photo pipeline
      * would average) and reduce to a 16-bit BLOCK-MEAN perceptual
      * hash: a 4×4 grid of block means, bit b set iff block b's mean
      * exceeds the global mean. All comparisons are cross-multiplied
      * integer sums (`bs·tp > ts·bc`), so the hash is exact and
      * engine-replayable — no float means. Block/row indices follow
      * STORED row order (BMPs store bottom-up; a vertical flip
      * permutes blocks consistently across all images, which leaves
      * equal-content grouping — the dedup signal — unchanged).
      * Non-24bpp or truncated payloads return None.
      */
    def bmpBlockHash(b: Array[Byte]): Option[Long] = {
      if (b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return None
      val off = le32(b, 10)
      val w = le32(b, 18)
      val h = le32(b, 22)
      val bpp = le16(b, 28)
      if (bpp != 24 || w <= 0 || h <= 0) return None
      val stride = ((w * 3 + 3) / 4) * 4
      if (b.length.toLong < off.toLong + stride.toLong * h) return None
      val bs = new Array[Long](16)
      val bc = new Array[Long](16)
      var ts = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = b(off + y * stride + x * 3) & 0xff
          val bi = (y * 4 / h) * 4 + (x * 4 / w)
          bs(bi) += v; bc(bi) += 1; ts += v
          x += 1
        }
        y += 1
      }
      val tp = w.toLong * h
      var hash = 0L
      var i = 0
      while (i < 16) {
        if (bs(i) * tp > ts * bc(i)) hash |= (1L << i)
        i += 1
      }
      Some(hash)
    }
  }

  /** The codec seam. Deterministic fake: "decodes" dimensions from the
    * payload hash. A real implementation would parse/decompress here.
    * Its territory has shrunk to the EXOTIC variants only — BMP pixels
    * ([[Headers.bmpBlockHash]]), 8-bit gray/RGB/RGBA PNG
    * ([[Headers.pngGray]] — real inflate + unfilter), baseline JPEG
    * scan data ([[Headers.jpegGray]] — real Huffman + dequant + IDCT),
    * PCM16 WAV ([[Headers.wavSamples16]]), and all formats' dimension
    * headers are REAL decoders; what remains stubbed is progressive/
    * arithmetic/12-bit JPEG, interlaced or 16-bit PNG, and non-PCM16
    * audio.
    */
  object DecoderStub {
    def decode(payload: Array[Byte]): (Int, Int) = {
      // ??? real codec goes here; deterministic fake for the harness:
      val h = java.util.Arrays.hashCode(payload)
      (math.floorMod(h, 1920) + 1, math.floorMod(h >> 8, 1080) + 1)
    }
  }

  /** Dispatch: real header parse for self-describing formats, stub for
    * the rest — the swap point the plumbing was built around.
    */
  def decodeDims(payload: Array[Byte]): (Int, Int) =
    Headers.parseBmp(payload)
      .orElse(Headers.parsePng(payload))
      .orElse(Headers.parseJpeg(payload))
      .getOrElse(DecoderStub.decode(payload))

  /** Batched partition-level decode — the Scala analogue of a Python
    * `mapInPandas` batch loop: iterate a partition in fixed-size
    * batches, pay codec setup once per batch, emit typed metadata.
    */
  def decodePartitions(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[DecodedMeta] = {
    implicit val enc: Encoder[DecodedMeta] = Encoders.product[DecodedMeta]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec init would happen here
        batch.iterator.map { r =>
          val (w, h) = decodeDims(r.bytes)
          DecodedMeta(r.media_id, r.bytes.length.toLong, w, h, ok = true)
        }
      }
    }
  }

  final case class AudioFrame(media_id: Long, frame_no: Int, energy: Long)

  /** Frame-level audio feature extraction over 16-bit PCM WAV blobs:
    * chunk-walk to the data chunk, split the samples into complete
    * frames of `frameSamples`, emit each frame's energy (sum of squared
    * samples) — EXACT integer math, so the extracted features
    * themselves sit under the cross-engine oracle, not just counts.
    * One blob row flatMaps to F feature rows entirely inside its
    * partition (no shuffle, no driver): the shape scales with corpus
    * bytes. Non-PCM16 blobs yield no rows (the codec stub's
    * territory); a trailing partial frame is dropped.
    */
  def audioFrameEnergies(ds: Dataset[MediaRecord],
      frameSamples: Int): Dataset[AudioFrame] = {
    implicit val enc: Encoder[AudioFrame] = Encoders.product[AudioFrame]
    ds.flatMap { rec =>
      Headers.wavSamples16(rec.bytes) match {
        case None => Iterator.empty[AudioFrame]
        case Some(samples) =>
          val nf = samples.length / frameSamples
          (0 until nf).iterator.map { f =>
            var acc = 0L
            var i = f * frameSamples
            val end = i + frameSamples
            while (i < end) {
              val s = samples(i).toLong
              acc += s * s
              i += 1
            }
            AudioFrame(rec.media_id, f, acc)
          }
      }
    }
  }
}
