package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-heavy narrow stages (sketching, hashing,
  * tokenizing — work measured per row, not per byte).
  *
  * Spark sizes scan partitions by BYTES (`files.maxPartitionBytes`),
  * which is right for IO-bound plans but wrong for kernel-bound ones: a
  * 600 KB / 5 k-document corpus file arrives as ONE partition, so a
  * minhash pass uses one core of 32. `widen` repartitions up to the
  * session default parallelism ONLY when the input has fewer
  * partitions — on a 100 TB corpus (thousands of splits) it is a no-op,
  * while for under-split inputs the round-robin shuffle costs the few
  * input bytes and unlocks the whole cluster for the kernel stage.
  */
object Par {
  def widen(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val maxPartBytes = spark.sessionState.conf.filesMaxPartitionBytes
    // optimizer stats only — physical planning (`df.rdd`) would codegen
    // the scan twice per query just to count partitions. Unknown stats
    // are a Long.MaxValue-ish sentinel: treat as big, leave alone.
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size.isValidLong && size.toLong > 0 && size.toLong < maxPartBytes)
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
  }
}
