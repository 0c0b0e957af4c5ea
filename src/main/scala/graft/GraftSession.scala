package graft

import org.apache.spark.sql.SparkSession

/** Engine-standard session configuration.
  *
  * One place for the settings every entry point needs so driver-run mains
  * (Verify/Bench) and user sessions agree:
  *  - UTC session timezone — oracle parity (SURVEY §7.5/2); the
  *    reference's +7 h WIB shift is always an explicit interval op.
  *  - AQE on — runtime coalescing of shuffle partitions, skew-join
  *    splitting, and dynamic broadcast decisions; this is the scale story
  *    for 100 TB plans whose optimal partitioning is data-dependent.
  *  - nanosAsLong — the `events` table stores TIMESTAMP(NANOS), illegal
  *    for Spark 4's reader; read as exact epoch-nanos longs instead
  *    (see [[Tables.events]]).
  */
object GraftSession {
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .withExtensions(new graft.expressions.GraftExtensions)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // Raise the broadcast threshold well past the demo dims/sketch
    // frames: on this single-node harness a 64 MB broadcast is far
    // cheaper than a shuffle, and it stops AQE flip-flopping between
    // broadcast and sort-merge for inputs sitting near the 10 MB
    // default (the main source of run-to-run bench variance). Cluster
    // deployments should size this to executor memory instead.
    .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    .config("spark.sql.adaptive.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Janino class cache sized for a many-query session (static conf,
    // so it must land on the FIRST session of the JVM). The 100-entry
    // default thrashes across a 333-query sweep: PlanSplit measured
    // 4,555 whole-stage compiles ≈ 44 s of the sweep; at 5,000 entries
    // the same-window A/B sweep dropped 314.5 → 297.9 s (median 0.537
    // → 0.469). Semantics-free — it caches compiled classes keyed by
    // generated source.
    // (dev A/B knob: SPARK_GRAFT_CODEGEN_CACHE overrides — static conf,
    // so a -D can't beat this builder value; VERDICT r12 item 8's cache
    // saturation A/B runs through it)
    .config("spark.sql.codegen.cache.maxEntries",
      sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
    // Propagate bucketed-scan SORT ORDER (off by default since
    // SPARK-32859): our bucketed stages write exactly one sorted file
    // per bucket, so with this on a bucket-key SMJ needs neither an
    // exchange NOR a sort on the bucketed side — the iterated-graph
    // rounds' whole point. Cost is a leaf-file count check per scan.
    .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    // ds partition values are strings by data-model contract (SURVEY
    // §1.1); without this, reading a ds=19950101 directory turns the
    // column into an int.
    .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    .config("spark.ui.enabled", "false")

  /** Local session for tests/tools: `local[cores]`, shuffle partitions
    * sized to cores (not the 200 default — wrong for local mode).
    */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = configure(SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
