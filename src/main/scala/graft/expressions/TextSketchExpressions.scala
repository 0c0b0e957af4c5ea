package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-sketch kernels for the dedup family (SURVEY.md §2.J):
  * shingle hashing, MinHash signatures, SimHash fingerprints.
  *
  * Why native Expressions instead of the declarative
  * `transform`/`sequence`/`slice`/`aggregate` compositions they
  * replace: Spark evaluates higher-order-function lambdas INTERPRETED,
  * one virtual call + boxing per element — profiled at sf0.1 the
  * shingle pipeline alone (260 k shingles from 5 k docs) took ~5 s,
  * which was the whole cost of the n-gram Jaccard bench outlier. These
  * kernels do the text → sketch step in one tight JVM loop per row and
  * stay inside whole-stage codegen via a static call.
  *
  * The scale story is bigger than the constant factor: a MinHash
  * signature computed per-document map-side means the LSH pipeline
  * never explodes shingles into rows at all — no 50×-row-expansion
  * shuffle before the band join. At 100 TB that turns the signature
  * stage from a corpus-sized shuffle into a pure scan.
  *
  * Oracle parity: all hashing is md5 over UTF-8 bytes, bit-identical in
  * DuckDB; the 60-bit shingle hash equals
  * `CAST('0x' || substring(md5(s),1,15) AS BIGINT)`, the 32-bit token
  * hash equals the 8-hex-char prefix parse, and signature minima use
  * byte-wise digest order == lexicographic order of lowercase hex.
  */
object TextSketch {

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private def md5(bytes: Array[Byte]): Array[Byte] = {
    val d = md5Local.get(); d.reset(); d.digest(bytes)
  }

  /** First 60 bits of the digest as a non-negative long — identical to
    * parsing the first 15 hex chars of the lowercase hex form.
    */
  private def first60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** First 32 bits of the digest (the `Text.md5Int` value). */
  def md5Int32(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 4) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** Mirrors `split(text, " ")` (Java regex semantics, limit -1):
    * empty tokens from runs of spaces are kept, as is a trailing empty
    * token — the declarative pipeline and the DuckDB oracle
    * (`string_split`) both see those.
    */
  private def words(text: UTF8String): Array[String] =
    text.toString.split(" ", -1)

  /** Word n-gram shingle strings in first-occurrence order with
    * duplicates removed — same contents as
    * `array_distinct(transform(sequence(1, greatest(len-n+1, 1)),
    * i -> concat_ws(' ', slice(words, i, n))))`.
    */
  def distinctShingles(text: UTF8String, n: Int): Array[String] = {
    val w = words(text)
    val count = math.max(w.length - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[String](count * 2)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, w.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(w(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** Per-document TERM FREQUENCIES in one map-side pass:
    * array<struct<t,tf>> with exactly the multiset
    * `explode(split(text, ' ')) → groupBy(term) → count` produces
    * (Java split semantics, limit -1: empty tokens from space runs and
    * a trailing empty token all count). The tf·idf family's tokenize →
    * per-(doc,term) aggregation was its largest shuffle — every TOKEN
    * of the corpus became a row before the count; this kernel emits
    * one row per DISTINCT term per doc straight off the scan, so the
    * only corpus-wide aggregate left is the term-level df count.
    */
  def termCounts(text: UTF8String): GenericArrayData = {
    val w = words(text)
    val counts = new java.util.LinkedHashMap[String, Long](w.length * 2)
    var i = 0
    while (i < w.length) {
      counts.put(w(i), counts.getOrDefault(w(i), 0L) + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(e.getKey), e.getValue)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Adjacent-symbol pair counts of a paren-wrapped BPE working string
    * `"(s1)(s2)(s3)..."` — one `(p, c)` struct per DISTINCT adjacent
    * pair, key `a + ' ' + b`, pairs touching the `'#'` word
    * boundary excluded (the BPE learners' filter). Replaces the
    * `split("\\)\\(")` + two `slice` + `zip_with(struct)` + explode
    * chain: one character walk, no intermediate arrays, and per-row
    * pre-aggregation — pair multiplicity folds into `c` BEFORE the
    * explode and shuffle (guide §2.3 "aggregate before you shuffle").
    * The space separator sorts below every symbol byte (symbols are
    * `[a-z0-9]+` concatenations, all bytes > 0x20), so ordering by the
    * packed key equals ordering by `(a, b)` — the learners' argmax
    * tie-break is unchanged.
    */
  def adjPairCounts(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val counts = new java.util.LinkedHashMap[String, Long]()
    val n = s.length
    var i = 0
    var prev: String = null
    var prevBoundary = true
    while (i < n) {
      if (s.charAt(i) == '(') {
        val j = s.indexOf(')', i + 1)
        if (j < 0) i = n
        else {
          val sym = s.substring(i + 1, j)
          val boundary = sym.length == 1 && sym.charAt(0) == '#'
          if (prev != null && !prevBoundary && !boundary) {
            val k = prev + " " + sym
            counts.put(k, counts.getOrDefault(k, 0L) + 1L)
          }
          prev = sym
          prevBoundary = boundary
          i = j + 1
        }
      } else i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(e.getKey), e.getValue)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct 60-bit shingle hashes for one document. */
  def shingleHash64(text: UTF8String, n: Int): GenericArrayData = {
    val sh = distinctShingles(text, n)
    val out = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) {
      out(i) = first60(md5(sh(i).getBytes("UTF-8")))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-POSITION 60-bit span hashes: one (i, h) struct per word
    * n-gram OCCURRENCE (1-based position, non-distinct; empty when the
    * doc has fewer than n words) — the duplicated-span excision layout
    * ([[graft.ops.Text.removeDuplicateSpans]]). One tight kernel pass
    * replaces a per-position slice + concat_ws + md5 expression chain
    * (each position allocated an n-element array copy — the measured
    * stage-0 CPU at sf10). The hash is the md5 60-bit prefix, so the
    * DuckDB oracle reproduces it exactly as
    * `CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT)`.
    */
  def spanHash60(text: UTF8String, n: Int): GenericArrayData = {
    val w = words(text)
    val count = w.length - (n - 1)
    if (count <= 0) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(w(j))
        j += 1
      }
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        i + 1, first60(md5(sb.toString.getBytes("UTF-8"))))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct 60-bit hashes of `text` and its single-CHARACTER-deletion
    * variants — the FastSS (Bocek et al. 2007) candidate keys for
    * edit-distance-1 linkage ([[graft.ops.Relational.fuzzyLinkageD1]]).
    * Hashes, not variant strings: candidate generation only needs
    * EQUALITY of variants, and the exact `levenshtein` filter
    * downstream removes any md5-collision false positive — so the join
    * can shuffle 8-byte longs instead of near-full-length strings.
    * Strings longer than `maxLen` chars emit only the self-hash (the
    * O(|s|²) variant bytes are a scan cost, and d=1 linkage is a
    * short-key operation — names, codes, ids; cap documented in the
    * operator contract).
    */
  def deletionHash64(text: UTF8String, maxLen: Int): GenericArrayData = {
    val s = text.toString
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    seen.add(first60(md5(s.getBytes("UTF-8"))))
    if (s.length <= maxLen) {
      val sb = new java.lang.StringBuilder(s.length - 1)
      var i = 0
      while (i < s.length) {
        sb.setLength(0)
        sb.append(s, 0, i).append(s, i + 1, s.length)
        seen.add(first60(md5(sb.toString.getBytes("UTF-8"))))
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned byte-wise digest compare — the same order as comparing
    * the lowercase hex strings (what the declarative form and DuckDB's
    * `min(md5(...))` use).
    */
  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** MinHash signature for one document: for seed s in [0, seeds), the
    * minimum md5 of s + "|" + shingle over the document's distinct
    * word n-gram shingles, as lowercase hex — computed map-side, no
    * shingle explode, no per-document aggregation shuffle.
    */
  def minhashSig(text: UTF8String, n: Int, seeds: Int): GenericArrayData = {
    val sh = distinctShingles(text, n)
    val prefixes = Array.tabulate(seeds)(s => (s.toString + "|").getBytes("UTF-8"))
    val mins = new Array[Array[Byte]](seeds)
    val d = md5Local.get()
    // shingle-outer loop: each shingle's UTF-8 bytes are encoded once
    // for all seed families; digests stream through update() with no
    // concat buffer
    var i = 0
    while (i < sh.length) {
      val shB = sh(i).getBytes("UTF-8")
      var s = 0
      while (s < seeds) {
        d.reset(); d.update(prefixes(s)); d.update(shB)
        val dig = d.digest()
        if (mins(s) == null || lessThan(dig, mins(s))) mins(s) = dig
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(toHex(_): AnyRef))
  }

  /** SimHash fingerprint for one document: each whitespace token votes
    * ±1 per bit from its 32-bit md5-prefix hash (every occurrence
    * votes, matching the declarative `aggregate` fold); bit j of the
    * result is set iff its vote sum is positive. One md5 per token —
    * the declarative form recomputed it once per token PER BIT.
    */
  def simhash(text: UTF8String, bits: Int): Long = {
    val w = words(text)
    val votes = new Array[Int](bits)
    var i = 0
    while (i < w.length) {
      val h = md5Int32(md5(w(i).getBytes("UTF-8")))
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** Base for the one-text-column sketch expressions: null-safe unary
  * string input, static-call codegen so whole-stage codegen spans are
  * not broken by the custom function.
  */
abstract class TextSketchExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.simpleString}")

  /** Java source for the static kernel call on input variable `c`. */
  protected def staticCall(c: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => staticCall(c))
}

/** `graft_shingle_hash64(text, n)` → array<bigint> of distinct 60-bit
  * md5-prefix hashes of the word n-gram shingles of `text`.
  */
case class ShingleHash64(child: Expression, n: Int) extends TextSketchExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = TextSketchExpressions.shingleName
  override def nullSafeEval(t: Any): Any =
    TextSketch.shingleHash64(t.asInstanceOf[UTF8String], n)
  override protected def staticCall(c: String): String =
    s"graft.expressions.TextSketch.shingleHash64($c, $n)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_span_hash60(text, n)` → array<struct<i:int,h:bigint>> of
  * per-position word n-gram span hashes (see [[TextSketch.spanHash60]]).
  */
case class SpanHash60(child: Expression, n: Int) extends TextSketchExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("i", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = TextSketchExpressions.spanHashName
  override def nullSafeEval(t: Any): Any =
    TextSketch.spanHash60(t.asInstanceOf[UTF8String], n)
  override protected def staticCall(c: String): String =
    s"graft.expressions.TextSketch.spanHash60($c, $n)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_minhash(text, n, seeds)` → array<string> MinHash signature
  * (per-seed minimum md5 hex over word n-gram shingles).
  */
case class MinHashSig(child: Expression, n: Int, seeds: Int) extends TextSketchExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = TextSketchExpressions.minhashName
  override def nullSafeEval(t: Any): Any =
    TextSketch.minhashSig(t.asInstanceOf[UTF8String], n, seeds)
  override protected def staticCall(c: String): String =
    s"graft.expressions.TextSketch.minhashSig($c, $n, $seeds)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_del_hash64(text, maxLen)` → array<bigint> FastSS deletion-
  * neighborhood hashes (see [[TextSketch.deletionHash64]]).
  */
case class DeletionHash64(child: Expression, maxLen: Int) extends TextSketchExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = TextSketchExpressions.delHashName
  override def nullSafeEval(t: Any): Any =
    TextSketch.deletionHash64(t.asInstanceOf[UTF8String], maxLen)
  override protected def staticCall(c: String): String =
    s"graft.expressions.TextSketch.deletionHash64($c, $maxLen)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_term_counts(text)` → array<struct<t:string,tf:bigint>> of
  * per-document term frequencies (see [[TextSketch.termCounts]]).
  */
case class TermCounts(child: Expression) extends TextSketchExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("t", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = TextSketchExpressions.termCountsName
  override def nullSafeEval(t: Any): Any =
    TextSketch.termCounts(t.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.expressions.TextSketch.termCounts($c)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_adj_pair_counts(w)` → array<struct<p:string,c:bigint>> of
  * adjacent-symbol pair counts of a paren-wrapped BPE working string
  * (see [[TextSketch.adjPairCounts]]).
  */
case class AdjPairCounts(child: Expression) extends TextSketchExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("p", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = TextSketchExpressions.adjPairName
  override def nullSafeEval(t: Any): Any =
    TextSketch.adjPairCounts(t.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.expressions.TextSketch.adjPairCounts($c)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_simhash(text, bits)` → bigint SimHash fingerprint. */
case class SimHash(child: Expression, bits: Int) extends TextSketchExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = TextSketchExpressions.simhashName
  override def nullSafeEval(t: Any): Any =
    TextSketch.simhash(t.asInstanceOf[UTF8String], bits)
  override protected def staticCall(c: String): String =
    s"graft.expressions.TextSketch.simhash($c, $bits)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextSketchExpressions {
  val shingleName = "graft_shingle_hash64"
  val spanHashName = "graft_span_hash60"
  val minhashName = "graft_minhash"
  val simhashName = "graft_simhash"
  val delHashName = "graft_del_hash64"
  val termCountsName = "graft_term_counts"
  val adjPairName = "graft_adj_pair_counts"

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val shingleBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$shingleName expects (text, n)")
    ShingleHash64(exprs.head, intLit(exprs(1), "n"))
  }
  val spanHashBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$spanHashName expects (text, n)")
    SpanHash60(exprs.head, intLit(exprs(1), "n"))
  }
  val minhashBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, s"$minhashName expects (text, n, seeds)")
    MinHashSig(exprs.head, intLit(exprs(1), "n"), intLit(exprs(2), "seeds"))
  }
  val simhashBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$simhashName expects (text, bits)")
    SimHash(exprs.head, intLit(exprs(1), "bits"))
  }
  val delHashBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$delHashName expects (text, maxLen)")
    DeletionHash64(exprs.head, intLit(exprs(1), "maxLen"))
  }
  val termCountsBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"$termCountsName expects (text)")
    TermCounts(exprs.head)
  }
  val adjPairBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"$adjPairName expects (w)")
    AdjPairCounts(exprs.head)
  }

  /** Column-API access; requires the extensions (or [[register]]). */
  def shingleHash64(text: Column, n: Int): Column =
    call_function(shingleName, text, org.apache.spark.sql.functions.lit(n))
  def spanHash60(text: Column, n: Int): Column =
    call_function(spanHashName, text, org.apache.spark.sql.functions.lit(n))
  def minhash(text: Column, n: Int, seeds: Int): Column =
    call_function(minhashName, text,
      org.apache.spark.sql.functions.lit(n), org.apache.spark.sql.functions.lit(seeds))
  def simhash(text: Column, bits: Int): Column =
    call_function(simhashName, text, org.apache.spark.sql.functions.lit(bits))
  def deletionHash64(text: Column, maxLen: Int): Column =
    call_function(delHashName, text, org.apache.spark.sql.functions.lit(maxLen))
  def termCounts(text: Column): Column =
    call_function(termCountsName, text)
  def adjPairCounts(w: Column): Column =
    call_function(adjPairName, w)

  /** Imperative per-session registration (idempotent); the extensions
    * hook in [[GraftExtensions]] is the standard path.
    */
  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction(shingleName, shingleBuilder, "built-in")
    r.createOrReplaceTempFunction(spanHashName, spanHashBuilder, "built-in")
    r.createOrReplaceTempFunction(minhashName, minhashBuilder, "built-in")
    r.createOrReplaceTempFunction(simhashName, simhashBuilder, "built-in")
    r.createOrReplaceTempFunction(delHashName, delHashBuilder, "built-in")
    r.createOrReplaceTempFunction(termCountsName, termCountsBuilder, "built-in")
    r.createOrReplaceTempFunction(adjPairName, adjPairBuilder, "built-in")
  }
}
