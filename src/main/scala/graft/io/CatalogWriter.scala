package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Catalog-TABLE variants of the partitioned sink — the literal shapes
  * the reference drives against the Hive metastore, exercised here
  * against the session catalog (same SQL surface, same semantics):
  *  - managed partitioned tables via `saveAsTable`
  *    (`Ingestion Data (MySQL).py:57,64`),
  *  - watermark discovery via `SHOW PARTITIONS` + sort + last
  *    (`Ingestion Data (MySQL).py:23-31`),
  *  - idempotent re-ingest via `TRUNCATE TABLE … PARTITION` + append
  *    (`Ingestion Data (SQL).py:143-146`).
  *
  * [[PartitionedWriter]] maps the same three behaviors to path-based
  * parquet (directory listing + dynamic partition overwrite) — the
  * preferred form: one atomic writer call instead of a
  * truncate-then-append window where a concurrent reader sees the
  * partition empty. This object keeps the catalog path honest: a user
  * coming from the reference can run the exact DDL they run today, and
  * `ScaleOpsSpec` proves both roads end at the same table state.
  */
object CatalogWriter {

  /** Create-or-append a managed partitioned table. First write creates
    * the table (partition columns land LAST in saveAsTable's layout,
    * as in the reference's `partitionBy("ds").saveAsTable`); later
    * writes append — pair with [[truncatePartitions]] for replays.
    */
  def writeTable(df: DataFrame, table: String, partitionCols: Seq[String] = Seq("ds")): Unit = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      df.write.partitionBy(partitionCols: _*).format("parquet").saveAsTable(table)
    } else {
      // byName: append must not depend on df column order once the
      // table schema is fixed (saveAsTable reorders partition cols)
      df.write.mode("append").partitionBy(partitionCols: _*)
        .format("parquet").saveAsTable(table)
    }
  }

  /** A9, catalog road — `SHOW PARTITIONS` + max. Output rows are
    * `ds=20240102` (multi-col: `ds=20240102/hh=03`); the watermark is
    * the max of the FIRST partition column's value, as the reference's
    * sort-and-take-last does. Metadata-only: no data files open.
    */
  def maxPartition(spark: SparkSession, table: String, partitionCol: String = "ds"): Option[String] = {
    if (!spark.catalog.tableExists(table)) return None
    val prefix = s"$partitionCol="
    val vals = spark.sql(s"SHOW PARTITIONS $table").collect().toSeq
      .map(_.getString(0).split('/').head)
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix))
    if (vals.isEmpty) None else Some(vals.max)
  }

  /** A8, catalog road — `TRUNCATE TABLE … PARTITION (ds='…')` for each
    * partition value present in `df`, exactly the reference's replay
    * guard. Kept separate from the append so the test can interleave
    * and so the non-atomicity (reader sees an empty partition between
    * the two calls) stays visible in the API rather than hidden.
    */
  def truncatePartitions(spark: SparkSession, table: String, df: DataFrame,
      partitionCol: String = "ds"): Unit = {
    val values = df.select(col(partitionCol).cast("string")).distinct().collect().map(_.getString(0))
    // Spark (unlike lenient Hive setups) raises PARTITIONS_NOT_FOUND on
    // truncating a partition that was never written; a replay guard
    // must be a no-op for brand-new days, so truncate only what exists.
    val prefix = s"$partitionCol="
    val existing = spark.sql(s"SHOW PARTITIONS $table").collect().toSet[org.apache.spark.sql.Row]
      .map(_.getString(0).split('/').head)
      .filter(_.startsWith(prefix)).map(_.stripPrefix(prefix))
    values.filter(existing.contains).foreach { v =>
      spark.sql(s"TRUNCATE TABLE $table PARTITION ($partitionCol = '$v')")
    }
  }

  /** The reference's full idempotent re-ingest: truncate the incoming
    * partitions, then append — replaces exactly the partitions present
    * in `df`, like dynamic partition overwrite but via DDL.
    */
  def truncateThenAppend(df: DataFrame, table: String, partitionCol: String = "ds"): Unit = {
    val spark = df.sparkSession
    if (spark.catalog.tableExists(table)) truncatePartitions(spark, table, df, partitionCol)
    writeTable(df, table, Seq(partitionCol))
  }

  /** A11 — DROP TABLE + REFRESH TABLE, the reference's cache-coherency
    * dance after out-of-band partition surgery.
    */
  def refresh(spark: SparkSession, table: String): Unit =
    spark.sql(s"REFRESH TABLE $table")

  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")

  /** Drop + remove the table's default warehouse location. A session
    * catalog is per-session state while the warehouse DIRECTORY
    * persists on disk, so a fresh session re-creating a managed table
    * whose location survived an earlier process hits
    * LOCATION_ALREADY_EXISTS — harness replays need both gone.
    */
  def dropWithLocation(spark: SparkSession, table: String): Unit = {
    drop(spark, table)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) { fs.delete(loc, true); () }
  }

  /** Filesystem location of a catalog table (for cross-checking the
    * catalog watermark against [[PartitionedWriter.maxPartition]]'s
    * directory listing on the same data).
    */
  def tableLocation(spark: SparkSession, table: String): String =
    spark.sql(s"DESCRIBE TABLE EXTENDED $table").collect()
      .find(_.getString(0) == "Location").map(_.getString(1))
      .getOrElse(sys.error(s"no Location for $table"))
}
