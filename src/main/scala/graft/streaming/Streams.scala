package graft.streaming

import graft.io.PartitionedWriter
import graft.ops.Scalars
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming twins of the batch time-window operators —
  * SURVEY.md §2.I. The reference's hand-rolled micro-batching (driver
  * `while` loops + truncate-partition re-writes) maps onto:
  *
  *   readStream -> withWatermark -> window()/session_window() aggs ->
  *   foreachBatch(dynamic-partition-overwrite write)
  *
  * which gives the same day-granularity exactly-once the reference
  * engineered by hand (SURVEY §2.I I5), plus real late-data handling.
  * Every transform here takes a DataFrame so the identical plan runs on
  * a batch frame (oracle-checked via QTimeseries) and on a stream
  * (MemoryStream-driven in tests).
  */
object Streams {

  /** I1+I4 — tumbling counts/sums with event-time watermark. */
  def tumblingAgg(events: DataFrame, width: String = "5 minutes", lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(Scalars.dec(col("value"))).cast("double").as("total"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("total"))

  /** I3 — session windows per user with watermark. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes", lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"), col("user_id"), col("n_events"))

  /** I5 — streaming dedup bounded by the watermark (the streaming form
    * of E4: state stays finite because rows older than the watermark
    * can no longer produce duplicates).
    */
  def dedupWithinWatermark(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** A8/I5 — exactly-once partitioned sink: each micro-batch stamps ds
    * and dynamic-partition-overwrites — re-processing a batch rewrites
    * the same partitions instead of duplicating them (the reference's
    * truncate+append loop, atomically).
    */
  def partitionedSink(agg: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    agg.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("5 seconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val stamped = batch.withColumn("ds", Scalars.dsOf(col("window_start")))
          PartitionedWriter.writePartitioned(stamped, path, compact = false)
        }
      }
}
