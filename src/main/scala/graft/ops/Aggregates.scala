package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation + window surface — SURVEY.md §2.E / §2.F. The reference
  * contains zero aggregations (verified, SURVEY §2.E); these are the
  * north-star extensions, built on Spark's hash aggregate (partial +
  * final, map-side combine for free) and WindowExec.
  */
object Aggregates {

  /** E1 — multi-measure hash aggregate (TPC-H Q1 shape). Partial
    * aggregation halves shuffle volume automatically; measures that feed
    * the oracle must be decimal-cast first (see [[Scalars.dec]]).
    */
  def summarize(df: DataFrame, keys: Seq[String], measures: Seq[Column]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(measures.head, measures.tail: _*)

  /** E4 — deterministic dedup: keep exactly one row per key, chosen by an
    * explicit tie-break ordering (`row_number`), not `dropDuplicates`
    * (whose survivor is partition-order-dependent — fine operationally,
    * wrong for a hash-checked oracle).
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** F4 — top-k rows per group. One shuffle on the group key; the
    * `row_number <= k` filter runs inside the window stage, so only k
    * rows per group survive into downstream stages.
    */
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** F2 — per-key delta of a (possibly cumulative) measure via `lag`.
    * This is the natural next step of the reference's domain: Zabbix
    * `net.if.*` counters are cumulative; throughput is the windowed
    * delta (cf. `Processing Data.py` which stores raw counters).
    */
  def lagDelta(df: DataFrame, key: String, order: Seq[Column], value: String, alias: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    df.withColumn(alias, col(value) - lag(col(value), 1).over(w))
  }

  /** H2/F4-at-scale — top-k VALUES per group as a bounded-heap
    * `Aggregator` (udaf): each partition keeps at most k doubles per
    * group (ascending array, min first), merges are k+k picks. Unlike
    * the window form ([[topKPerGroup]]), which SORTS every group's full
    * row set, memory and shuffle are O(groups × k) regardless of group
    * size — the difference between a window sort over a 10^9-row hot
    * group and a 10-element buffer. Multiset semantics (duplicates
    * kept), result sorted descending — deterministic for the oracle.
    */
  class TopKValuesAggregator(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Double, Array[Double], Seq[Double]] {
    def zero: Array[Double] = Array.empty
    private def insert(buf: Array[Double], v: Double): Array[Double] =
      if (buf.length < k) (buf :+ v).sorted
      else if (v <= buf(0)) buf
      else { buf(0) = v; buf.sorted }
    def reduce(buf: Array[Double], v: Double): Array[Double] = insert(buf, v)
    def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      b.foldLeft(a)(insert)
    def finish(r: Array[Double]): Seq[Double] = r.sorted.reverse.toSeq
    def bufferEncoder = org.apache.spark.sql.Encoders.kryo[Array[Double]]
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Column form of [[TopKValuesAggregator]]. */
  def topKValues(valueCol: Column, k: Int): Column =
    udaf(new TopKValuesAggregator(k)).apply(valueCol)

  /** E1-ext — INCREMENTAL aggregate maintenance, the 100 TB answer to
    * "the daily rollup must not rescan history": keep a partials table
    * of ALGEBRAIC state (sum / count / min / max — every state merges
    * associatively) keyed by (batch keys ++ group keys); each arriving
    * batch appends only ITS partial rows, and the serving aggregate is
    * a re-merge of states — work scales with the number of stored
    * partials (groups × batches), never with the raw history. Measures
    * must be decimal-cast upstream (see [[Scalars.dec]]) so partial
    * sums merge exactly; `avg` is served as merged-sum / merged-count
    * rather than stored (averages don't merge, their components do).
    */
  def algebraicPartial(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      sum(col(valueCol)).as("p_sum"),
      count(col(valueCol)).as("p_cnt"),
      min(col(valueCol)).as("p_min"),
      max(col(valueCol)).as("p_max"))

  /** Merge [[algebraicPartial]] states down to `keys` — exact for any
    * batch split because each stored state is itself a sum/count/min/max.
    */
  def mergePartials(partials: DataFrame, keys: Seq[String]): DataFrame =
    partials.groupBy(keys.map(col): _*).agg(
      sum(col("p_sum")).as("sum_val"),
      sum(col("p_cnt")).as("n_val"),
      min(col("p_min")).as("min_val"),
      max(col("p_max")).as("max_val"))

  /** Per-(keys, bucket) 64-bit membership words over a non-negative
    * integer id column — the roaring-bitmap idea in relational form.
    * `bucket = id div 64`, the word is `bit_or(1L << (id mod 64))`.
    * The words are an EXACT, MERGEABLE distinct-count state: unlike a
    * `count(distinct)` (whose per-partition state is the id set
    * itself), partial states here are fixed 8-byte words that combine
    * by `bit_or` across any batch/partition split, so an incremental
    * pipeline can store per-day word tables and serve any date range
    * by re-OR-ing — never rescanning raw history. Shuffle volume is
    * (keys × occupied buckets) words, independent of event counts.
    */
  def bitmapWords(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.groupBy((keys.map(col) :+
        expr(s"CAST(`$idCol` AS BIGINT) DIV 64").as("bucket")): _*)
      .agg(expr(
        s"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(CAST(`$idCol` AS BIGINT) % 64 AS INT)))")
        .as("word"))

  /** EXACT per-group median of an integer column, returned as the
    * doubled form `med2 = v_lo + v_hi` (the two middle order
    * statistics; equal when the count is odd) so callers stay in
    * integer arithmetic — `median = med2 / 2`. NULL values are ignored,
    * matching `percentile`/`median` in both engines (they do not rank
    * below the minimum).
    *
    * Spark's exact `percentile` buffers every value of a group in
    * aggregation memory, which OOMs a 100×-scale hot group; this form
    * reduces to a VALUE-FREQUENCY table first (one row per distinct
    * (keys, value) — shuffle and window cost scale with distinct
    * values, never with row count) and reads both middle order
    * statistics off the running cumulative count. Exact for any
    * distribution, mergeable across days by summing frequency tables.
    */
  def medianTimes2(df: DataFrame, keys: Seq[String], valCol: String,
      alias: String = "med2"): DataFrame =
    medianTimes2Freq(
      df.filter(col(valCol).isNotNull)
        .groupBy((keys.map(col) :+ col(valCol)): _*)
        .agg(count(lit(1)).as("__c")),
      keys, valCol, "__c", alias)

  /** [[medianTimes2]] over a PRE-AGGREGATED value-frequency table
    * (r13): callers that need several medians of frames derived from
    * the same rows build the (keys, value, count) table ONCE and take
    * every median — and the final weighted counts — off it, instead
    * of re-scanning and re-shuffling the raw rows per median (guide
    * §2.3 "aggregate before you shuffle"). Rows with a NULL value are
    * ignored for the median exactly as [[medianTimes2]] ignores them;
    * duplicate `valCol` rows per key group are fine (the running sum
    * crosses any middle position inside a tie run, whose value IS the
    * tie value).
    */
  def medianTimes2Freq(freq: DataFrame, keys: Seq[String], valCol: String,
      cntCol: String, alias: String = "med2"): DataFrame = {
    val cum = freq.filter(col(valCol).isNotNull)
      .withColumn("__cum", sum(col(cntCol)).over(
        Window.partitionBy(keys.map(col): _*).orderBy(col(valCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col(cntCol)).over(
        Window.partitionBy(keys.map(col): _*)))
    // 0-indexed middle positions k1=(n-1) div 2, k2=n div 2; the value
    // at position k is the first value whose cumulative count > k.
    cum.groupBy(keys.map(col): _*)
      .agg((min(when(col("__cum") >= expr("(__n + 1) DIV 2"), col(valCol))) +
            min(when(col("__cum") >= expr("__n DIV 2 + 1"), col(valCol))))
        .as(alias))
  }

  /** Collapse [[bitmapWords]] states to exact distinct counts per
    * `keys`: first `bit_or`-merge any duplicate (keys, bucket) rows —
    * so a raw union of per-day word tables is safe input, exactly the
    * serving pattern [[bitmapWords]] advertises — then distinct =
    * Σ popcount(word) because each id owns exactly one bit in exactly
    * one (bucket, word). The extra merge level is a no-op (and nearly
    * free: partial bit_or combines map-side) when the input is already
    * merged per (keys, bucket).
    */
  def bitmapDistinct(words: DataFrame, keys: Seq[String]): DataFrame =
    words.groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(expr("bit_or(word)").as("__w"))
      .groupBy(keys.map(col): _*)
      .agg(sum(expr("bit_count(__w)")).cast("long").as("n_distinct"))
}
