package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Poor-man's table-format statistics: a per-FILE min/max manifest over
  * a sort column, consulted at read time to skip whole files — the same
  * file-skipping idea Delta/Iceberg keep in their metadata layers,
  * re-expressed with nothing but parquet (SURVEY.md §2.A scale extra).
  *
  * Why it matters at 100 TB: partition pruning only skips along the
  * PARTITION key. A second, finer-grained predicate column (event time,
  * id range) still scans every file of a surviving partition unless
  * something records per-file bounds. Parquet footers do (row-group
  * min/max), but the driver still has to LIST and OPEN every file to
  * read footers — at millions of files the listing is the bottleneck.
  * A manifest is one tiny sidecar table: planning cost is a scan of
  * (files) rows, not (files) round-trips.
  *
  * Layout contract: `writeWithManifest` range-partitions the data by
  * the stats column before writing, so files hold DISJOINT ranges and
  * the bounds are actually selective (a random layout gives every file
  * the full domain and the manifest prunes nothing — same reason
  * [[graft.ops.Scalars.zorderKey]] sorts before interleaving).
  */
object Manifest {

  /** Write `df` under `path/data` laid out by `statsCol`, plus a
    * `path/manifest` parquet of (file, lo, hi). The manifest is built
    * from the data as written (one scan, grouped by
    * `input_file_name`), so bounds are exact regardless of how the
    * writer split tasks.
    */
  def writeWithManifest(df: DataFrame, path: String, statsCol: String,
      numFiles: Int = 8): Unit = {
    val spark = df.sparkSession
    df.repartitionByRange(numFiles, col(statsCol))
      .write.mode("overwrite").parquet(s"$path/data")
    spark.read.parquet(s"$path/data")
      .groupBy(input_file_name().as("file"))
      .agg(min(col(statsCol)).as("lo"), max(col(statsCol)).as("hi"))
      .coalesce(1) // manifest is files-count rows — tiny by contract
      .write.mode("overwrite").parquet(s"$path/manifest")
  }

  /** Files whose [lo, hi] could contain a row of [lo, hi] — the
    * planning step. Driver-sized by the same contract as IVF centroids:
    * one row per file, and the caller hands the result straight to
    * `spark.read.parquet(files: _*)`.
    */
  def candidateFiles(spark: SparkSession, path: String, lo: org.apache.spark.sql.Column,
      hi: org.apache.spark.sql.Column): Seq[String] =
    spark.read.parquet(s"$path/manifest")
      .filter(col("hi") >= lo && col("lo") <= hi)
      .select("file").collect().toSeq.map(_.getString(0))

  /** Closed-interval range read that only opens manifest-surviving
    * files. The residual filter stays (bounds overlap ≠ containment),
    * and lands in PushedFilters so surviving files still prune row
    * groups footer-side.
    */
  def readPruned(spark: SparkSession, path: String, statsCol: String,
      lo: org.apache.spark.sql.Column, hi: org.apache.spark.sql.Column): DataFrame = {
    val files = candidateFiles(spark, path, lo, hi)
    val base =
      if (files.isEmpty) spark.read.parquet(s"$path/data").limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(statsCol) >= lo && col(statsCol) <= hi)
  }

  /** MULTI-column manifest under a caller-chosen layout key — the
    * Z-ORDER data-skipping composition: lay the files out by an
    * interleaved-bits key ([[graft.ops.Scalars.zorderKey]]) and every
    * tracked column's per-file [lo, hi] becomes a tight box, so a
    * conjunctive range predicate on ANY tracked dimension prunes
    * files (a single-column range layout only ever prunes its own
    * column). The layout column itself is dropped from the data files.
    */
  def writeWithManifestKeyed(df: DataFrame, path: String, statsCols: Seq[String],
      layoutCol: String, numFiles: Int = 8): Unit = {
    val spark = df.sparkSession
    df.repartitionByRange(numFiles, col(layoutCol))
      .sortWithinPartitions(col(layoutCol))
      .drop(layoutCol)
      .write.mode("overwrite").parquet(s"$path/data")
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"lo_$c"), max(col(c)).as(s"hi_$c")))
    spark.read.parquet(s"$path/data")
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/manifest")
  }

  /** Files whose per-column boxes intersect the query box. */
  def candidateFilesBox(spark: SparkSession, path: String,
      box: Seq[(String, org.apache.spark.sql.Column, org.apache.spark.sql.Column)]): Seq[String] = {
    val cond = box.map { case (c, lo, hi) => col(s"hi_$c") >= lo && col(s"lo_$c") <= hi }
      .reduce(_ && _)
    spark.read.parquet(s"$path/manifest").filter(cond)
      .select("file").collect().toSeq.map(_.getString(0))
  }

  /** Conjunctive box read over a [[writeWithManifestKeyed]] layout:
    * open only box-overlapping files, keep the residual filters (which
    * also land in PushedFilters for row-group pruning).
    */
  def readPrunedBox(spark: SparkSession, path: String,
      box: Seq[(String, org.apache.spark.sql.Column, org.apache.spark.sql.Column)]): DataFrame = {
    val files = candidateFilesBox(spark, path, box)
    val base =
      if (files.isEmpty) spark.read.parquet(s"$path/data").limit(0)
      else spark.read.parquet(files: _*)
    box.foldLeft(base) { case (d, (c, lo, hi)) =>
      d.filter(col(c) >= lo && col(c) <= hi)
    }
  }
}
