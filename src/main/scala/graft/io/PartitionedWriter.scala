package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** ds-partitioned parquet sink — SURVEY.md §2.A (A6-A11), the
  * re-expression of the reference's `writeTable` utility
  * (`Ingestion Data (MySQL).py:33-65` / `Processing Data.py:33-65`).
  *
  * Differences from the reference, by design:
  *  - Idempotent re-ingest is dynamic partition overwrite, not
  *    `TRUNCATE TABLE ... PARTITION` + append (A8): one atomic writer
  *    call replaces exactly the partitions present in the frame.
  *  - Output sizing uses Catalyst's plan statistics instead of the
  *    write-a-10%-sample-and-stat-it dance (A10) — the reference's
  *    version silently never ran (undefined `pathf`, SURVEY §0.1/5).
  *  - AQE's coalescePartitions handles the shuffle side; this utility
  *    only fixes the final file count.
  */
object PartitionedWriter {

  val targetFileBytes: Long = 128L * 1024 * 1024 // 128 MiB, as the reference (SQL:44)

  /** A10 — size-adaptive compaction: repartition so output files land
    * near 128 MiB, estimated from the optimized plan's stats (parquet
    * row-count + size, filter selectivity applied by Catalyst).
    */
  /** Upper bound on compaction fan-out; 2^20 files of 128 MiB = 128 TiB,
    * beyond which a single write should be split anyway.
    */
  val maxOutputFiles: Int = 1 << 20

  def sizeAdaptive(df: DataFrame): DataFrame = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // Sources without stats (e.g. in-memory datasets) report Catalyst's
    // "unknown" sentinel (defaultSizeInBytes = Long.MaxValue): naively
    // dividing it asks for billions of partitions. Leave such frames
    // as-is — AQE coalescing still right-sizes the shuffle side.
    if (bytes >= BigInt(Long.MaxValue) / 2) df
    else {
      val n = ((bytes + targetFileBytes - 1) / targetFileBytes).toInt
      df.repartition(math.min(math.max(1, n), maxOutputFiles))
    }
  }

  /** A6/A7/A8 — partitioned parquet write. `overwritePartitions=true`
    * gives the truncate-partition-then-append semantics (replace only
    * the ds values present in `df`); false appends.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCol: String = "ds",
      overwritePartitions: Boolean = true,
      compact: Boolean = true): Unit = {
    val out = if (compact) sizeAdaptive(df) else df
    val mode = if (overwritePartitions) SaveMode.Overwrite else SaveMode.Append
    out.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out.write.mode(mode).partitionBy(partitionCol).parquet(path)
  }

  /** A9 — high-watermark: max partition value of an existing dataset.
    * The reference's `SHOW PARTITIONS` + sort + collect
    * (`Ingestion Data (MySQL).py:23-31`) becomes a metadata-only
    * aggregate: on a partitioned path the partition column is read
    * from directory names, no data scan.
    */
  def maxPartition(spark: SparkSession, path: String, partitionCol: String = "ds"): Option[String] =
    spark.read.parquet(path)
      .agg(max(col(partitionCol)).cast("string"))
      .head().getString(0) match { case null => None; case v => Some(v) }
}
