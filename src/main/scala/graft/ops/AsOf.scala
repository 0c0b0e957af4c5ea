package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — SURVEY.md §2.C C5 extension: for every left
  * row, the single most recent right row with `rightTime <= leftTime`
  * on the same key.
  *
  * Implementation is the union-merge form, not a range join: tag both
  * sides, union, sort each key by (time, side) once, and carry the
  * latest right attributes forward with a running `last(..., ignoreNulls)`
  * window. Cost is ONE shuffle + sort of |L|+|R| rows — no quadratic
  * key-range blowup, no skew amplification; this is the plan that
  * survives 100 TB, where a `rtime <= ltime` theta-join would
  * cross-product each key group. (Composition of built-ins per the
  * custom-operator preference order; no Catalyst extension needed.)
  */
object AsOf {

  /** @param left  left frame
    * @param right right frame
    * @param key   equi-key column present on both sides
    * @param leftTime/rightTime  monotonic ordering columns (same type)
    * @param rightCols right columns to carry (renamed as given)
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightCols: Map[String, String]): DataFrame = {
    val lTagged = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val rTagged = right.select(
      (col(key) +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        rightCols.map { case (from, to) => col(from).as(s"__r_$to") }.toSeq): _*)

    // align schemas for the union
    val rNulls = rightCols.values.map(to => lit(null).as(s"__r_$to"))
    val lAligned = lTagged.select(
      (lTagged.columns.map(col).toSeq ++ rNulls.toSeq): _*)
    val rAligned = lTagged.columns.filterNot(c => c == key || c == "__t" || c == "__side")
      .foldLeft(rTagged) { case (df, c) => df.withColumn(c, lit(null)) }
      .select(lAligned.columns.map(col): _*)

    // right rows sort before left at equal time: rtime == ltime matches
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.values.foldLeft(lAligned.unionByName(rAligned)) {
      case (df, to) => df.withColumn(to, last(col(s"__r_$to"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .drop((Seq("__t", "__side") ++ rightCols.values.map(to => s"__r_$to")): _*)
  }

  /** As-of FORWARD join: for every left row, the single earliest right
    * row with `rightTime >= leftTime` on the same key — the symmetric
    * union-merge scanned in descending time. `rightTie` makes the
    * match deterministic when right rows share a timestamp (the
    * smallest (time, tie) at-or-after the left row wins). Same cost
    * shape as [[asofBackward]]: one shuffle + sort of |L|+|R|.
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightTie: String,
      rightCols: Map[String, String]): DataFrame = {
    val lTagged = left.withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)).withColumn("__tie", lit(null).cast("long"))
    val rTagged = right.select(
      (col(key) +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        col(rightTie).cast("long").as("__tie") +:
        rightCols.map { case (from, to) => col(from).as(s"__r_$to") }.toSeq): _*)

    val rNulls = rightCols.values.map(to => lit(null).as(s"__r_$to"))
    val lAligned = lTagged.select(
      (lTagged.columns.map(col).toSeq ++ rNulls.toSeq): _*)
    val rAligned = lTagged.columns.filterNot(c => c == key || c == "__t" || c == "__side" || c == "__tie")
      .foldLeft(rTagged) { case (df, c) => df.withColumn(c, lit(null)) }
      .select(lAligned.columns.map(col): _*)

    // Descending time scan; at equal time the right row sorts BEFORE
    // the left (rtime == ltime matches), and among equal-time right
    // rows the larger tie comes first so the smallest is seen last —
    // last(ignoreNulls) then carries min(time, tie) at-or-after.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").desc, col("__side").asc, col("__tie").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.values.foldLeft(lAligned.unionByName(rAligned)) {
      case (df, to) => df.withColumn(to, last(col(s"__r_$to"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .drop((Seq("__t", "__side", "__tie") ++ rightCols.values.map(to => s"__r_$to")): _*)
  }

  /** As-of NEAREST join: the right row minimizing |rightTime -
    * leftTime| per left row, composed from one backward and one
    * forward pass joined on `leftId`; equidistant candidates resolve
    * to the backward (earlier) match. Still two union-merges + one
    * id-equi-join — never a per-key cross product.
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftId: String,
      leftTime: String,
      rightTime: String,
      rightTie: String,
      rightCols: Map[String, String]): DataFrame = {
    val bCols = rightCols.map { case (f, t) => f -> s"__b_$t" } + (rightTime -> "__b_t")
    val fCols = rightCols.map { case (f, t) => f -> s"__f_$t" } + (rightTime -> "__f_t")
    val b = asofBackward(left, right, key, leftTime, rightTime, bCols)
    val f = asofForward(left, right, key, leftTime, rightTime, rightTie, fCols)
      .select((col(leftId) +: fCols.values.map(col).toSeq): _*)
    val joined = b.join(f, Seq(leftId))
    val distB = col(leftTime) - col("__b_t")
    val distF = col("__f_t") - col(leftTime)
    val takeBackward = col("__f_t").isNull || (col("__b_t").isNotNull && distB <= distF)
    rightCols.values.foldLeft(joined) { case (df, to) =>
      df.withColumn(to, when(takeBackward, col(s"__b_$to")).otherwise(col(s"__f_$to")))
    }.drop((bCols.values ++ fCols.values).toSeq: _*)
  }
}
