package graft.expressions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expression for the embedding dot product —
  * SURVEY.md §4 "custom pieces confined to extensions" / H1.
  *
  * Why a custom Expression instead of the `zip_with`+`aggregate`
  * composition: higher-order functions evaluate their lambda
  * INTERPRETED once per element (a per-element virtual call + boxing),
  * which is the hot inner loop of every similarity query — at millions
  * of candidate pairs × 64 dims that is the whole query cost. This
  * expression stays inside whole-stage codegen as one primitive
  * `double` loop.
  *
  * Semantics are identical to the HOF form on equal-length arrays:
  * left-to-right fold of `double(a_i) * double(b_i)` — bit-identical to
  * DuckDB's sequential list_sum, so oracle parity is preserved.
  * Mismatched lengths use the shorter prefix; null arrays yield null.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left); val rf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getL = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ($getL) * ($getR);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between two float/double array columns — the
  * IVF-assignment hot loop. Same sequential left-to-right fold of
  * `(a_i - b_i)^2` as the `zip_with`+`aggregate` composition and
  * DuckDB's `list_sum(list_transform(...))`, so distances are
  * bit-identical to the oracle; same codegen rationale as
  * [[FloatVectorDot]].
  */
case class FloatVectorL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left); val rf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val getL = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ($getL) - ($getR);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static kernel behind [[MapDotDecimal]] — kept in an object so the
  * generated code can call it without capturing the expression tree.
  */
object MapDotKernel {
  /** Sparse dot of two term → weight maps with Spark-CAST-exact
    * DECIMAL(38,18) accumulation: per shared key, the IEEE product
    * `a(k) * b(k)` converts to decimal the way Spark's
    * `CAST(double AS DECIMAL(38,18))` does — `BigDecimal.valueOf`
    * (shortest decimal rep, the scala `BigDecimal.decimal` path) then
    * `setScale(18, HALF_UP)` — and the scale-18 sum is exact, so the
    * result is bit-identical to the declarative
    * `aggregate(map_keys(a), 0D, ...)` fold this replaces (parity
    * pinned in ExpressionsSpec over random weights) while running as
    * one tight JVM loop instead of an interpreted lambda per element.
    */
  def mapDotDec(a: org.apache.spark.sql.catalyst.util.MapData,
      b: org.apache.spark.sql.catalyst.util.MapData): Double = {
    val nB = b.numElements()
    val bKeys = b.keyArray(); val bVals = b.valueArray()
    val lookup = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
      java.lang.Double](nB * 2)
    var i = 0
    while (i < nB) {
      lookup.put(bKeys.getUTF8String(i), bVals.getDouble(i))
      i += 1
    }
    val nA = a.numElements()
    val aKeys = a.keyArray(); val aVals = a.valueArray()
    var acc = java.math.BigDecimal.ZERO
    var j = 0
    while (j < nA) {
      val w = lookup.get(aKeys.getUTF8String(j))
      val prod = if (w == null) 0.0 else aVals.getDouble(j) * w.doubleValue()
      // Spark's CAST(double AS DECIMAL) nulls out NaN/±Inf, and the HOF
      // fold this kernel replaced would null-propagate the whole sum;
      // BigDecimal.valueOf would THROW instead (ADVICE r9). The sentinel
      // must REJECT like null would: Spark orders NaN ABOVE every
      // numeric (and NaN >= x is true), so a NaN sentinel would pass
      // cosine thresholds and sort FIRST in (cos DESC) top-k. -Inf is
      // the rejecting equivalent: below any threshold, sorts last.
      if (!java.lang.Double.isFinite(prod)) return Double.NegativeInfinity
      acc = acc.add(java.math.BigDecimal.valueOf(prod)
        .setScale(18, java.math.RoundingMode.HALF_UP))
      j += 1
    }
    acc.doubleValue()
  }

  /** Sparse dot of two LONG-keyed weight maps whose key arrays are
    * SORTED ASCENDING (the [[graft.ops.Dedup]] tf·idf vector layout:
    * term ids assigned once per run, vectors folded through
    * `sort_array`). Long keys + sortedness buy two things over
    * [[mapDotDec]] at 100×-scale pair volumes:
    *   - the UnsafeMapData payload is primitive-packed (16 B/term vs
    *     ~2× that for string keys with offsets) — the pair-stream
    *     shuffle that dominates the scoring stage halves;
    *   - the intersection is a branch-predictable two-pointer merge —
    *     no per-term hashing, no UTF8String churn.
    * Decimal accumulation is IDENTICAL to [[mapDotDec]]: per shared
    * key the IEEE product converts via the Spark-CAST path
    * (`BigDecimal.valueOf` + `setScale(18, HALF_UP)`) and the scale-18
    * sum is exact — non-shared keys' exact-zero addends can't change
    * the sum, so dropping them is value-preserving. Non-finite
    * products map to -Inf (the [[mapDotDec]] rejecting-sentinel
    * contract: fails any threshold, sorts last in cos-DESC top-k).
    */
  def mapDotDecLong(a: org.apache.spark.sql.catalyst.util.MapData,
      b: org.apache.spark.sql.catalyst.util.MapData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    val aK = a.keyArray(); val aV = a.valueArray()
    val bK = b.keyArray(); val bV = b.valueArray()
    var acc = java.math.BigDecimal.ZERO
    var i = 0; var j = 0
    while (i < na && j < nb) {
      val ka = aK.getLong(i); val kb = bK.getLong(j)
      if (ka < kb) i += 1
      else if (ka > kb) j += 1
      else {
        val prod = aV.getDouble(i) * bV.getDouble(j)
        if (!java.lang.Double.isFinite(prod)) return Double.NegativeInfinity
        acc = acc.add(java.math.BigDecimal.valueOf(prod)
          .setScale(18, java.math.RoundingMode.HALF_UP))
        i += 1; j += 1
      }
    }
    acc.doubleValue()
  }
}

/** `graft_larr_dot_dec(map<bigint,double>, map<bigint,double>)` →
  * double: sorted-key merge dot (see [[MapDotKernel.mapDotDecLong]]).
  */
case class MapDotDecimalLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = VectorExpressions.mapDotLongName

  private def okType(dt: DataType): Boolean = dt match {
    case MapType(LongType, DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires map<bigint,double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    MapDotKernel.mapDotDecLong(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.MapDotKernel.mapDotDecLong($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_map_dot_dec(map<string,double>, map<string,double>)` →
  * double: the weighted near-dup scoring kernel (see [[MapDotKernel]]).
  */
case class MapDotDecimal(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = VectorExpressions.mapDotName

  private def okType(dt: DataType): Boolean = dt match {
    case MapType(StringType, DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires map<string,double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    MapDotKernel.mapDotDec(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.MapDotKernel.mapDotDec($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static kernel behind [[SortedIntersectCount]]. */
object SortedIntersectKernel {
  /** |A ∩ B| of two ASCENDING-sorted distinct long arrays by a
    * branch-predictable two-pointer merge — the set-overlap hot loop
    * of the similarity-join verification stage. `array_intersect` +
    * `size` builds a hash set and materializes the intersection ARRAY
    * per pair (measured: 17 s of q_prefix_jaccard's 19.6 s sf10
    * verification stage at 31M candidate pairs); this counts in place,
    * zero allocation. Callers sort per document ONCE (`sort_array`),
    * never per pair.
    */
  def count(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { n += 1; i += 1; j += 1 }
    }
    n
  }
}

/** `graft_sorted_inter(array<bigint>, array<bigint>)` → bigint:
  * intersection size of two sorted distinct long arrays (see
  * [[SortedIntersectKernel.count]]). Equal to
  * `size(array_intersect(a, b))` on distinct inputs when both arrays
  * are sorted ascending — the caller's contract.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = VectorExpressions.sortedInterName

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectKernel.count(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.SortedIntersectKernel.count($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid argmin over a FIXED centroid set held as a plain
  * JVM reference object — the IVF-assignment next-decade road (VERDICT
  * r12 item 4). The previous form inlined the k×d centroid set as a
  * `typedlit` literal: correct and map-only, but the literal is part of
  * the expression tree, so the PLAN grows O(k·d) (treeString, codegen
  * source, per-stage serialization all carry it) and every row churns
  * k struct allocations through `array_min(transform(...))`. Here the
  * centroids live in two arrays referenced via
  * `ctx.addReferenceObj` — shipped ONCE per stage inside the
  * torrent-broadcast task binary (Spark's own `InSet` treatment, i.e.
  * broadcast-in-everything-but-name), never in the plan text — and the
  * argmin is one tight primitive loop with zero allocation.
  *
  * Semantics are BYTE-IDENTICAL to
  * `array_min(transform(typedlit(cents), c -> struct(l2sq(vec, c._2),
  * c._1)))`: the same sequential `(double)a_i − (double)b_i` squared
  * fold as [[FloatVectorL2Sq]] (so DuckDB-oracle parity carries over),
  * and the same (dist2 asc, cid asc) tie-break — centroids are
  * iterated in ascending-cid order with a strict `<`, so the lowest
  * cid wins ties exactly like struct min-ordering. Parity is pinned in
  * ExpressionsSpec against the literal composition.
  *
  * Constructor invariant (enforced by the builder): `cids` ascending,
  * `cids.length == vecs.length > 0`.
  */
case class CentroidArgminL2(child: Expression,
    cids: Array[Long], vecs: Array[Array[Float]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("dist2", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false)))
  override def prettyName: String = VectorExpressions.centroidArgminName

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got " +
        child.dataType.simpleString)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // keep the k×d payload out of plan strings — k and d tell the reader
  // everything the treeString needs
  override def flatArguments: Iterator[Any] =
    Iterator(child, s"k=${cids.length}", s"d=${vecs.headOption.map(_.length).getOrElse(0)}")
  override def stringArgs: Iterator[Any] = flatArguments

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val xf = isFloat
    var best = Double.PositiveInfinity
    var bestCid = 0L
    var c = 0
    while (c < vecs.length) {
      val cv = vecs(c)
      val n = math.min(x.numElements(), cv.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
        val d = xv - cv(i).toDouble
        acc += d * d
        i += 1
      }
      if (acc < best) { best = acc; bestCid = cids(c) }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, bestCid))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cidsRef = ctx.addReferenceObj("argminCids", cids, "long[]")
      val vecsRef = ctx.addReferenceObj("argminVecs", vecs, "float[][]")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cv = ctx.freshName("cv")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |double $best = Double.POSITIVE_INFINITY;
         |long $bestCid = 0L;
         |for (int $c = 0; $c < $vecsRef.length; $c++) {
         |  float[] $cv = $vecsRef[$c];
         |  int $n = java.lang.Math.min($a.numElements(), $cv.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = ($get) - (double) $cv[$i];
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $best) { $best = $acc; $bestCid = $cidsRef[$c]; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{java.lang.Double.valueOf($best), java.lang.Long.valueOf($bestCid)});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  val dotName = "graft_dot"
  val l2Name = "graft_l2sq"
  val mapDotName = "graft_map_dot_dec"
  val mapDotLongName = "graft_larr_dot_dec"
  val sortedInterName = "graft_sorted_inter"
  val centroidArgminName = "graft_centroid_argmin"

  private val dotBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$dotName expects 2 arguments")
    FloatVectorDot(exprs.head, exprs(1))
  }

  private[expressions] val l2Builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$l2Name expects 2 arguments")
    FloatVectorL2Sq(exprs.head, exprs(1))
  }

  private[expressions] val mapDotBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$mapDotName expects 2 arguments")
    MapDotDecimal(exprs.head, exprs(1))
  }

  private[expressions] val mapDotLongBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$mapDotLongName expects 2 arguments")
    MapDotDecimalLong(exprs.head, exprs(1))
  }

  private[expressions] val sortedInterBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$sortedInterName expects 2 arguments")
    SortedIntersectCount(exprs.head, exprs(1))
  }

  /** The centroid set arrives as a FOLDABLE array<struct<bigint,
    * array<float>>> literal (the Column API passes `typedlit(cents)`);
    * the builder evaluates it ONCE here and hands [[CentroidArgminL2]]
    * plain JVM arrays — the literal never reaches the resolved plan.
    */
  private[expressions] val centroidArgminBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$centroidArgminName expects 2 arguments")
    val centsExpr = exprs(1)
    require(centsExpr.foldable, s"$centroidArgminName centroid argument must be foldable")
    val ad = centsExpr.eval().asInstanceOf[ArrayData]
    require(ad != null && ad.numElements() > 0,
      s"$centroidArgminName requires a non-empty centroid set")
    val pairs = (0 until ad.numElements()).map { i =>
      val row = ad.getStruct(i, 2)
      val arr = row.getArray(1)
      (row.getLong(0), Array.tabulate(arr.numElements())(j => arr.getFloat(j)))
    }.sortBy(_._1)
    CentroidArgminL2(exprs.head, pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  /** Imperative per-session registration (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(dotName, dotBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(l2Name, l2Builder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(mapDotName, mapDotBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(mapDotLongName, mapDotLongBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(sortedInterName, sortedInterBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(centroidArgminName, centroidArgminBuilder, "built-in")
  }

  /** Column-API access; requires [[register]] (or the extensions) first. */
  def dot(a: Column, b: Column): Column = call_function(dotName, a, b)
  def l2sq(a: Column, b: Column): Column = call_function(l2Name, a, b)
  def mapDotDec(a: Column, b: Column): Column = call_function(mapDotName, a, b)
  def mapDotDecLong(a: Column, b: Column): Column = call_function(mapDotLongName, a, b)
  def sortedIntersectCount(a: Column, b: Column): Column =
    call_function(sortedInterName, a, b)
  def centroidArgmin(vec: Column, cents: Seq[(Long, Seq[Float])]): Column =
    call_function(centroidArgminName, vec,
      org.apache.spark.sql.functions.typedlit(cents))
}

/** `SparkSessionExtensions` hook: injects the native functions at
  * session build time — `SparkSession.builder.withExtensions(new
  * GraftExtensions)` or `spark.sql.extensions=graft.expressions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier(VectorExpressions.dotName),
      new ExpressionInfo(classOf[FloatVectorDot].getName, VectorExpressions.dotName),
      { exprs: Seq[Expression] => FloatVectorDot(exprs.head, exprs(1)) }))
    e.injectFunction((FunctionIdentifier(VectorExpressions.l2Name),
      new ExpressionInfo(classOf[FloatVectorL2Sq].getName, VectorExpressions.l2Name),
      VectorExpressions.l2Builder))
    e.injectFunction((FunctionIdentifier(VectorExpressions.mapDotName),
      new ExpressionInfo(classOf[MapDotDecimal].getName, VectorExpressions.mapDotName),
      VectorExpressions.mapDotBuilder))
    e.injectFunction((FunctionIdentifier(VectorExpressions.mapDotLongName),
      new ExpressionInfo(classOf[MapDotDecimalLong].getName, VectorExpressions.mapDotLongName),
      VectorExpressions.mapDotLongBuilder))
    e.injectFunction((FunctionIdentifier(VectorExpressions.sortedInterName),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, VectorExpressions.sortedInterName),
      VectorExpressions.sortedInterBuilder))
    e.injectFunction((FunctionIdentifier(VectorExpressions.centroidArgminName),
      new ExpressionInfo(classOf[CentroidArgminL2].getName, VectorExpressions.centroidArgminName),
      VectorExpressions.centroidArgminBuilder))
    e.injectFunction((FunctionIdentifier(TextSketchExpressions.shingleName),
      new ExpressionInfo(classOf[ShingleHash64].getName, TextSketchExpressions.shingleName),
      TextSketchExpressions.shingleBuilder))
    e.injectFunction((FunctionIdentifier(TextSketchExpressions.spanHashName),
      new ExpressionInfo(classOf[SpanHash60].getName, TextSketchExpressions.spanHashName),
      TextSketchExpressions.spanHashBuilder))
    e.injectFunction((FunctionIdentifier(TextSketchExpressions.minhashName),
      new ExpressionInfo(classOf[MinHashSig].getName, TextSketchExpressions.minhashName),
      TextSketchExpressions.minhashBuilder))
    e.injectFunction((FunctionIdentifier(TextSketchExpressions.simhashName),
      new ExpressionInfo(classOf[SimHash].getName, TextSketchExpressions.simhashName),
      TextSketchExpressions.simhashBuilder))
    e.injectFunction((FunctionIdentifier(TextSketchExpressions.delHashName),
      new ExpressionInfo(classOf[DeletionHash64].getName, TextSketchExpressions.delHashName),
      TextSketchExpressions.delHashBuilder))
    e.injectFunction((FunctionIdentifier(TextSketchExpressions.termCountsName),
      new ExpressionInfo(classOf[TermCounts].getName, TextSketchExpressions.termCountsName),
      TextSketchExpressions.termCountsBuilder))
    e.injectFunction((FunctionIdentifier(TextSketchExpressions.adjPairName),
      new ExpressionInfo(classOf[AdjPairCounts].getName, TextSketchExpressions.adjPairName),
      TextSketchExpressions.adjPairBuilder))
    e.injectFunction((FunctionIdentifier(NormalizeExpressions.canonName),
      new ExpressionInfo(classOf[CanonicalizeText].getName, NormalizeExpressions.canonName),
      { exprs: Seq[Expression] => CanonicalizeText(exprs.head) }))
    e.injectFunction((FunctionIdentifier(NormalizeExpressions.withinEdit1Name),
      new ExpressionInfo(classOf[WithinEdit1].getName, NormalizeExpressions.withinEdit1Name),
      { exprs: Seq[Expression] => WithinEdit1(exprs.head, exprs(1)) }))
    e.injectFunction((FunctionIdentifier(StringSimilarityExpressions.jwName),
      new ExpressionInfo(classOf[JaroWinkler].getName, StringSimilarityExpressions.jwName),
      StringSimilarityExpressions.jwBuilder))
    e.injectFunction((FunctionIdentifier(StringSimilarityExpressions.entropyName),
      new ExpressionInfo(classOf[CharEntropy].getName, StringSimilarityExpressions.entropyName),
      StringSimilarityExpressions.entropyBuilder))
    e.injectFunction((FunctionIdentifier(BpeExpressions.countName),
      new ExpressionInfo(classOf[BpeTokenCount].getName, BpeExpressions.countName),
      BpeExpressions.countBuilder))
    e.injectFunction((FunctionIdentifier(BpeExpressions.tokensName),
      new ExpressionInfo(classOf[BpeTokens].getName, BpeExpressions.tokensName),
      BpeExpressions.tokensBuilder))
    // declarative HOF dot products silently upgrade to the native loop
    e.injectOptimizerRule(_ => RewriteHofDot)
    // discarded-rank row_number()<=k windows upgrade to the native
    // heap-based top-k operator (no sorts)
    e.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
    // whole-operator tier: plans graft.plans.TopKPerGroup as a
    // partial/final pair around a group-key exchange
    e.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
  }
}
