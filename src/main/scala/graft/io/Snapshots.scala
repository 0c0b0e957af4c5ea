package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot reads — "table AS OF generation N" — on top of
  * the [[Manifest]] sidecar idea: the snapshot-isolation core of the
  * Delta/Iceberg table formats re-expressed with nothing but parquet
  * (public knowledge; no table-format library involved).
  *
  * Physical contract:
  *  - `path/data/` is APPEND-ONLY: every commit lands its rows as new
  *    files; no commit ever rewrites or deletes an existing file.
  *  - `path/manifest/gen=N/` is one tiny parquet listing the data
  *    files LIVE in generation N. A logical append's manifest is the
  *    previous file set plus the new files; a logical overwrite's is
  *    just the new files — the old files stay on disk, owned by older
  *    generations.
  *
  * Reading as of N is then simply `spark.read.parquet(files-of-N)`:
  * no tombstones to reconcile, no log replay. Because data files are
  * immutable, every historical generation is byte-stable forever
  * (`ScaleOpsSpec` pins this), and concurrent readers of older
  * generations are never disturbed by a writer — the warehouse
  * time-travel idiom ("rerun last month's close against the table as
  * it was") that plain partitioned parquet cannot answer once a
  * partition is overwritten.
  *
  * At 100 TB: commit cost is one manifest write of (files) rows;
  * planning cost of a historical read is one manifest scan. File
  * listings never walk `data/` at read time, so the
  * millions-of-files listing bottleneck stays out of the read path
  * (the same argument as [[Manifest]]).
  */
object Snapshots {

  private def hfs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataDir(path: String) = new Path(s"$path/data")
  private def genDir(path: String, gen: Long) = new Path(f"$path/manifest/gen=$gen%06d")

  private def listDataFiles(spark: SparkSession, path: String): Set[String] = {
    val d = dataDir(path)
    val fs = hfs(spark, d)
    if (!fs.exists(d)) Set.empty
    else fs.listStatus(d).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).toSet
  }

  /** Highest committed generation, or None for an empty table. */
  def latestGeneration(spark: SparkSession, path: String): Option[Long] = {
    val m = new Path(s"$path/manifest")
    val fs = hfs(spark, m)
    if (!fs.exists(m)) None
    else {
      val gens = fs.listStatus(m).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("gen=")).map(_.stripPrefix("gen=").toLong)
      if (gens.isEmpty) None else Some(gens.max)
    }
  }

  /** Live data files of generation `gen`. */
  def filesOf(spark: SparkSession, path: String, gen: Long): Seq[String] = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(genDir(path, gen).toString)
      .select(col("file")).collect().toSeq.map(_.getString(0)).sorted
  }

  /** Commit `df` as the next generation. `overwrite = false` appends
    * (new manifest = previous files + this commit's files); `true`
    * logically replaces the table (new manifest = this commit's files
    * only) while leaving every older file untouched on disk.
    * Returns the committed generation number.
    *
    * Concurrency contract: the commit's files are identified EXACTLY
    * (staged under a commit-unique directory, then moved into `data/`
    * — never inferred from before/after listings, so a concurrent
    * writer or stray file cannot be mis-attributed), and the
    * generation number is CLAIMED by an atomic exclusive create of a
    * `_claim-gen=N` marker — two racing commits get distinct
    * generations, never a clobbered manifest. What stays single-writer
    * is append LINEARIZATION: a racing append may carry a prior-file
    * set that misses the other commit's still-in-flight files.
    * Serialize appends externally (one committer per table — the same
    * contract Delta's OCC loses to by retrying; this engine states it
    * instead).
    */
  def commit(df: DataFrame, path: String, overwrite: Boolean = false): Long = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val stage = new Path(s"$path/.stage-${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(stage.toString)
    val fs = hfs(spark, stage)
    val d = dataDir(path)
    fs.mkdirs(d)
    // Spark part names embed a job-unique UUID, so moves cannot collide
    val added = fs.listStatus(stage).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map { s =>
        val dst = new Path(d, s.getPath.getName)
        fs.rename(s.getPath, dst); dst.toString
      }.sorted
    fs.delete(stage, true)
    val prior = latestGeneration(spark, path)
    var gen = prior.map(_ + 1).getOrElse(0L)
    fs.mkdirs(new Path(s"$path/manifest"))
    var claimed = false
    while (!claimed) {
      try {
        fs.create(new Path(s"$path/manifest/_claim-gen=$gen"), false).close()
        claimed = true
      } catch {
        case _: java.io.IOException => gen += 1 // lost the race; next slot
      }
    }
    val carried =
      if (overwrite) Seq.empty
      else prior.map(filesOf(spark, path, _)).getOrElse(Seq.empty)
    (carried ++ added).toDF("file").coalesce(1)
      .select(col("file")).write.mode("overwrite")
      .parquet(genDir(path, gen).toString)
    gen
  }

  /** The table as of generation `gen` — a plain parquet read of that
    * generation's file set. A generation with NO live files (an
    * overwrite commit of an empty frame, whose write produces no part
    * files) reads as the empty table with the data dir's schema.
    */
  def readAsOf(spark: SparkSession, path: String, gen: Long): DataFrame = {
    val files = filesOf(spark, path, gen)
    if (files.isEmpty) spark.read.parquet(dataDir(path).toString).limit(0)
    else spark.read.parquet(files: _*)
  }

  /** The current table (latest generation). */
  def read(spark: SparkSession, path: String): DataFrame =
    readAsOf(spark, path,
      latestGeneration(spark, path).getOrElse(sys.error(s"empty snapshot table at $path")))

  /** Retention: drop every generation older than `keepLast` and delete
    * data files no surviving generation references. Returns the number
    * of data files removed. The deletion set is (all files ever listed)
    * minus (files of surviving generations) — computed from manifests
    * only, so vacuum never lists `data/` and its cost scales with
    * manifest rows, not file count on disk. Readers of SURVIVING
    * generations are untouched (their file sets are disjoint from the
    * deletion set by construction); readers of vacuumed generations
    * lose them — that is the retention contract, same as any table
    * format's VACUUM.
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int): Long = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val latest = latestGeneration(spark, path)
      .getOrElse(return 0L)
    val cutoff = latest - keepLast + 1 // keep [cutoff, latest]
    if (cutoff <= 0) return 0L
    val gens = (0L to latest)
      .filter(g => hfs(spark, genDir(path, g)).exists(genDir(path, g)))
    val (dropGens, keepGens) = gens.partition(_ < cutoff)
    val keep = keepGens.flatMap(filesOf(spark, path, _)).toSet
    val dead = dropGens.flatMap(filesOf(spark, path, _)).toSet -- keep
    val fs = hfs(spark, dataDir(path))
    dead.foreach(f => fs.delete(new Path(f), false))
    dropGens.foreach { g =>
      fs.delete(genDir(path, g), true)
      fs.delete(new Path(s"$path/manifest/_claim-gen=$g"), false)
    }
    dead.size.toLong
  }
}
