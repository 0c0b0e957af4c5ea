package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-window operators — SURVEY.md §2.I. The reference approximates
  * streaming with wall-clock `while` loops over 5-min/1-h/1-day slices
  * (`Ingestion Data (XML).py:70-76`, `Ingestion Data (MySQL).py:122-127`,
  * `Processing Data.py:118-127`); the idiomatic engine form is Spark's
  * `window`/`session_window` functions, which work identically over
  * batch frames and Structured Streaming sources — the streaming twins
  * (readStream + watermark) live in [[graft.streaming]] and reuse these
  * exact plans.
  */
object Timeseries {

  /** I1 — tumbling window aggregate. One shuffle on (window, keys);
    * partial aggregation runs map-side before the exchange.
    */
  def tumbling(df: DataFrame, ts: Column, width: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, width) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** I2 — sliding window aggregate: each row lands in width/slide
    * windows; Spark expands rows with a generator before the aggregate.
    */
  def sliding(df: DataFrame, ts: Column, width: String, slide: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, width, slide) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** I3 — session window (gap-merged) per key. Batch semantics: events
    * whose gap is strictly less than `gap` merge into one session.
    */
  def sessionized(df: DataFrame, ts: Column, gap: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(ts, gap) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** I4 — batch form of a watermark: keep rows within `lateness` of the
    * frame's max timestamp. The max is a broadcast one-row aggregate —
    * no shuffle of the fact side; at scale this is a scan + a scalar.
    * (Streaming twin: `withWatermark` in [[graft.streaming]].)
    */
  def watermarkFilter(df: DataFrame, tsNs: Column, latenessNs: Long): DataFrame = {
    val maxTs = df.agg(max(tsNs).as("__max_ts"))
    df.crossJoin(broadcast(maxTs))
      .filter(tsNs >= col("__max_ts") - lit(latenessNs))
      .drop("__max_ts")
  }
}
