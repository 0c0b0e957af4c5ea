package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A REAL byte-pair-encoding subword tokenizer (Sennrich et al. 2016,
  * public knowledge) as a native codegen'd kernel — the token counter
  * the corpus-budget operators (`q_token_pack` packing bins, mixture
  * budgets, curriculum ordering) should meter with, replacing the
  * regex-run `bpeishCount` stand-in.
  *
  * Encode semantics (exactly what a BPE encoder does at inference
  * time, with the merge table frozen): lowercase; split into words on
  * non-[a-z0-9] runs (word boundaries are hard — merges never cross
  * them); start each word as its character symbols; then apply each
  * merge-table entry IN TABLE ORDER, merging every adjacent (a, b)
  * occurrence left-to-right non-overlapping per pass. Remaining
  * symbols are the tokens.
  *
  * Oracle parity: the same computation is replayable in plain SQL via
  * the paren-wrapped symbol string — `(t)(h)(e)(#)…` with `#` the word
  * boundary — where one merge pass is one
  * `replace(s, '(a)(b)', '(ab)')`. Wrapping makes the textual replace
  * SYMBOL-SAFE: a naive space-separated form would let `(e, r)` match
  * inside `…the r…` (the `e` being the tail of symbol `the`), and
  * left-to-right `replace` on the wrapped form merges exactly the
  * pairs the per-word array pass merges (the replacement `(ab)` can
  * never complete a new occurrence of the same pattern, and later
  * table entries see merged symbols just as the array pass does).
  * [[Bpe.sqlTokensExpr]] / [[Bpe.sqlCountExpr]] generate that SQL from
  * the SAME merge table, so the Scala kernel and every DuckDB oracle
  * share one source of truth.
  */
object Bpe {

  /** Frozen merge table, highest-priority first — a hand-built,
    * cascading English table (th→the, in+g→ing, an+d→and …); a
    * production vocabulary would be learned from corpus pair counts,
    * but the ENCODER — the part the engine runs per document at
    * 100 TB — is identical for any table.
    */
  val merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"), ("a", "n"),
    ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"),
    ("e", "n"), ("o", "r"), ("e", "s"), ("i", "s"), ("i", "t"),
    ("o", "u"), ("a", "l"), ("e", "d"), ("s", "t"), ("a", "r"),
    ("t", "o"), ("c", "o"), ("l", "e"), ("m", "e"), ("s", "e"),
    ("n", "o"), ("u", "s"), ("h", "a"), ("l", "i"), ("w", "h"),
    ("ou", "t"), ("b", "le"), ("c", "k"), ("q", "u"), ("0", "0"))

  private final val Boundary = "#"

  /** Symbols of `text`: single chars of each lowercased [a-z0-9] run,
    * with one [[Boundary]] symbol per separator run.
    */
  private def baseSymbols(text: String): Array[String] = {
    val s = text.toLowerCase
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
    var i = 0
    var prevBoundary = false
    while (i < s.length) {
      val c = s.charAt(i)
      val isAl = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (isAl) { out += String.valueOf(c); prevBoundary = false }
      else if (!prevBoundary) { out += Boundary; prevBoundary = true }
      i += 1
    }
    out.toArray
  }

  /** One merge pass: left-to-right, non-overlapping. */
  private def mergePass(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
        out += (a + b); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /** All BPE tokens of `text` (boundaries dropped), in order. */
  def encode(text: String): Array[String] = {
    var syms = baseSymbols(text)
    var k = 0
    while (k < merges.length) {
      val (a, b) = merges(k)
      syms = mergePass(syms, a, b)
      k += 1
    }
    syms.filter(_ != Boundary)
  }

  // ---- kernel entry points (static calls from codegen) ----

  def tokenCount(text: UTF8String): Long = encode(text.toString).length.toLong

  def tokens(text: UTF8String): GenericArrayData =
    new GenericArrayData(encode(text.toString).map(UTF8String.fromString(_: String)))

  // ---- single-source-of-truth oracle SQL generation ----

  /** The final wrapped-symbol string for SQL `expr` (a text column):
    * lower → boundary-collapse to `#` → wrap each char in parens →
    * the full merge-table replace chain.
    */
  private def sqlWrapped(expr: String): String = {
    val base = s"regexp_replace(regexp_replace(lower($expr), " +
      s"'[^a-z0-9]+', '$Boundary', 'g'), '(.)', '(\\1)', 'g')"
    merges.foldLeft(base) { case (acc, (a, b)) =>
      s"replace($acc, '($a)($b)', '($a$b)')"
    }
  }

  /** SQL (DuckDB) expression: the BPE token count of text column
    * `expr` — open-paren count minus boundary-symbol count.
    */
  def sqlCountExpr(expr: String): String = {
    val w = sqlWrapped(expr)
    s"CAST((len($w) - len(replace($w, '(', ''))) - " +
      s"((len($w) - len(replace($w, '($Boundary)', ''))) / 3) AS BIGINT)"
  }

  /** SQL (DuckDB) expression: the BPE token list of text column
    * `expr` as a VARCHAR[] (boundaries filtered out).
    */
  def sqlTokensExpr(expr: String): String = {
    val w = sqlWrapped(expr)
    // "(th)(e)(#)…" → strip outer parens, split on ')(' , drop '#'
    s"list_filter(string_split(trim($w, '()'), ')('), t -> t <> '$Boundary')"
  }
}

/** `graft_bpe_count(text)` → bigint BPE token count. */
case class BpeTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = BpeExpressions.countName
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.simpleString}")
  override def nullSafeEval(t: Any): Any =
    Bpe.tokenCount(t.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Bpe.tokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_bpe_tokens(text)` → array<string> BPE tokens in order. */
case class BpeTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = BpeExpressions.tokensName
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.simpleString}")
  override def nullSafeEval(t: Any): Any =
    Bpe.tokens(t.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Bpe.tokens($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeExpressions {
  val countName = "graft_bpe_count"
  val tokensName = "graft_bpe_tokens"

  val countBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"$countName expects (text)")
    BpeTokenCount(exprs.head)
  }
  val tokensBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"$tokensName expects (text)")
    BpeTokens(exprs.head)
  }

  def bpeCount(text: Column): Column = call_function(countName, text)
  def bpeTokens(text: Column): Column = call_function(tokensName, text)
}
