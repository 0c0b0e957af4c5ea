package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native string-similarity / text-statistics kernels (SURVEY.md §2.J
  * record-linkage + quality-scoring families).
  *
  * Why native Expressions: both kernels are per-row O(len) or
  * O(len²)-windowed loops with small constant state. Expressed
  * declaratively they would need an explode (one row per character /
  * per character-pair) plus a re-grouping shuffle — corpus-sized row
  * expansion for a value that never leaves the row. As single-pass
  * JVM loops behind a static codegen call they stay inside
  * whole-stage codegen and add zero shuffle at any scale.
  *
  * Oracle parity:
  *  - [[JaroWinkler]] implements the textbook Jaro-Winkler similarity
  *    (match window `max(|a|,|b|)/2 - 1`, transposition halving,
  *    Winkler prefix bonus up to 4 chars at p=0.1 applied only when
  *    the Jaro score exceeds the 0.7 boost threshold) — verified
  *    value-identical to DuckDB's `jaro_winkler_similarity` on the
  *    classic pairs (MARTHA/MARHTA=0.961…, DWAYNE/DUANE=0.84,
  *    CRATE/TRACE=0.7333…, sub-threshold pairs unbosted).
  *  - [[CharEntropy]] equals the SQL `-SUM(p*log2(p))` over per-
  *    character frequencies; queries round both sides to 6 decimals
  *    so float summation order cannot flip the compare.
  */
object StringSimilarity {

  /** Textbook Jaro similarity over UTF-16 code units (our corpora are
    * ASCII; for full Unicode parity with byte-oriented engines,
    * canonicalize first — see [[NormalizeExpressions]]).
    */
  def jaro(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val sl = s.length
    val tl = t.length
    if (sl == 0 && tl == 0) return 1.0
    if (sl == 0 || tl == 0) return 0.0
    val window = math.max(math.max(sl, tl) / 2 - 1, 0)
    val sMatched = new Array[Boolean](sl)
    val tMatched = new Array[Boolean](tl)
    var m = 0
    var i = 0
    while (i < sl) {
      val lo = math.max(0, i - window)
      val hi = math.min(tl - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatched(j) && s.charAt(i) == t.charAt(j)) {
          sMatched(i) = true; tMatched(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars in order of appearance on each side
    var transpositions = 0
    var si = 0
    var tj = 0
    while (si < sl) {
      if (sMatched(si)) {
        while (!tMatched(tj)) tj += 1
        if (s.charAt(si) != t.charAt(tj)) transpositions += 1
        tj += 1
      }
      si += 1
    }
    val md = m.toDouble
    // Half-transpositions use INTEGER division (the rapidfuzz/DuckDB
    // convention): when the two matched sequences are different
    // multisets the mismatch count can be ODD (e.g. "Customer#000001607"
    // vs "Customer0#00011607" mismatches 5 of 17 matched positions),
    // and floor(5/2)=2 vs 5/2.0=2.5 was this kernel's one observed
    // divergence from jaro_winkler_similarity (caught at sf0.1).
    (md / sl + md / tl + (md - (transpositions / 2)) / md) / 3.0
  }

  /** Jaro-Winkler: prefix bonus (≤4 chars, p=0.1) above the 0.7 boost
    * threshold — DuckDB `jaro_winkler_similarity` semantics.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val s = a.toString
    val t = b.toString
    val max = math.min(4, math.min(s.length, t.length))
    var l = 0
    while (l < max && s.charAt(l) == t.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Shannon entropy (bits/char) of the character-unigram distribution,
    * one pass + one pass over the (≤65536-entry) frequency table.
    * Frequencies accumulate in char-code order so the summation order
    * is deterministic run-to-run.
    */
  def charEntropy(a: UTF8String): Double = {
    val s = a.toString
    val n = s.length
    if (n == 0) return 0.0
    // ASCII fast path covers the corpora; fall back to a map otherwise.
    var nonAscii = false
    val counts = new Array[Int](128)
    var i = 0
    while (i < n && !nonAscii) {
      val c = s.charAt(i)
      if (c < 128) counts(c) += 1 else nonAscii = true
      i += 1
    }
    val freq: Iterator[Int] =
      if (!nonAscii) counts.iterator.filter(_ > 0)
      else {
        val m = new java.util.TreeMap[Character, Integer]()
        var k = 0
        while (k < n) { m.merge(s.charAt(k), 1, (x, y) => x + y); k += 1 }
        import scala.jdk.CollectionConverters._
        m.values().asScala.iterator.map(_.toInt)
      }
    val nd = n.toDouble
    var h = 0.0
    freq.foreach { c =>
      val p = c / nd
      h -= p * (math.log(p) / math.log(2.0))
    }
    h
  }
}

/** `graft_jaro_winkler(a, b)` → double in [0,1]. */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = StringSimilarityExpressions.jwName
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string columns, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.StringSimilarity.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_char_entropy(text)` → double, bits per character. */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = StringSimilarityExpressions.entropyName
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.simpleString}")
  override def nullSafeEval(t: Any): Any =
    StringSimilarity.charEntropy(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.StringSimilarity.charEntropy($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringSimilarityExpressions {
  val jwName = "graft_jaro_winkler"
  val entropyName = "graft_char_entropy"

  val jwBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$jwName expects (a, b)")
    JaroWinkler(exprs.head, exprs(1))
  }
  val entropyBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"$entropyName expects (text)")
    CharEntropy(exprs.head)
  }

  /** Column-API access; requires the extensions (or session registry). */
  def jaroWinkler(a: Column, b: Column): Column = call_function(jwName, a, b)
  def charEntropy(text: Column): Column = call_function(entropyName, text)
}
