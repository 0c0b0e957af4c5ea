package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for corpus cleaning — SURVEY.md §2.J
  * J3 extension. Web-scraped text mixes composed and decomposed forms
  * of the same glyph ("é" as U+00E9 vs e+U+0301), fullwidth variants,
  * and case noise; exact dedup, shingle hashing, and token counting all
  * key on RAW bytes, so two byte-level spellings of the same text
  * silently defeat them. The fix is canonicalization BEFORE hashing:
  * NFC-normalize, strip combining marks (accent folding), lowercase.
  *
  * A native expression (not a UDF) for the same reason as
  * [[FloatVectorDot]]: this runs once per document on the full corpus
  * scan — the map side of every dedup — and must stay inside
  * whole-stage codegen. The loop itself delegates to
  * `java.text.Normalizer` (ICU-grade tables ship with the JVM; no
  * dependency).
  */
object TextNorm {
  /** NFD → drop combining marks → NFC → lowercase(ROOT). Matches
    * DuckDB `lower(strip_accents(nfc_normalize(x)))` on Latin text
    * (both decompose, drop Mn marks, recompose).
    */
  def canon(s: UTF8String): UTF8String = {
    if (s == null) return null
    val nfd = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val ch = nfd.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      i += 1
    }
    val nfc = java.text.Normalizer.normalize(sb, java.text.Normalizer.Form.NFC)
    UTF8String.fromString(nfc.toLowerCase(java.util.Locale.ROOT))
  }
}

/** `graft_canon(text)` — canonicalized text, see [[TextNorm.canon]]. */
case class CanonicalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_canon"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    TextNorm.canon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextNorm.canon($c)")

  override protected def withNewChildInternal(newChild: Expression): CanonicalizeText =
    copy(child = newChild)
}

/** O(n) predicate for `levenshtein(a, b) <= 1` — the exact-check step
  * of FastSS linkage ([[graft.ops.Relational.fuzzyLinkageD1]]). The
  * general DP computes the full |a|×|b| matrix and allocates per call;
  * for a FIXED bound of 1 a two-pointer scan decides it: equal lengths
  * → at most one mismatched position (substitution); lengths differing
  * by one → the longer string minus one char equals the shorter
  * (insertion/deletion). Runs on every candidate pair, so it must be a
  * no-allocation codegen'd loop. UTF-16 unit comparison — identical to
  * code-point Levenshtein for any ≤1-unit edit on BMP text.
  */
object EditDistance {
  def within1(a: UTF8String, b: UTF8String): Boolean = {
    val x = a.toString; val y = b.toString
    val (s, l) = if (x.length <= y.length) (x, y) else (y, x)
    if (l.length - s.length > 1) return false
    if (s.length == l.length) {
      var miss = 0
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) != l.charAt(i)) { miss += 1; if (miss > 1) return false }
        i += 1
      }
      true
    } else {
      var i = 0; var j = 0; var skipped = false
      while (i < s.length) {
        if (s.charAt(i) == l.charAt(j)) { i += 1; j += 1 }
        else if (!skipped) { skipped = true; j += 1 }
        else return false
      }
      true
    }
  }
}

/** `graft_within_edit1(a, b)` — true iff `levenshtein(a, b) <= 1`. */
case class WithinEdit1(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = NormalizeExpressions.withinEdit1Name

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    EditDistance.within1(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.EditDistance.within1($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): WithinEdit1 =
    copy(left = newLeft, right = newRight)
}

object NormalizeExpressions {
  val canonName = "graft_canon"
  val withinEdit1Name = "graft_within_edit1"

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(canonName),
      new ExpressionInfo(classOf[CanonicalizeText].getName, canonName),
      (children: Seq[Expression]) => CanonicalizeText(children.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(withinEdit1Name),
      new ExpressionInfo(classOf[WithinEdit1].getName, withinEdit1Name),
      (children: Seq[Expression]) => WithinEdit1(children.head, children(1)))
  }

  def canon(c: Column): Column = call_function(canonName, c)
  def withinEdit1(a: Column, b: Column): Column = call_function(withinEdit1Name, a, b)
}
