package graft

import org.apache.spark.sql.functions._

/** The DataSource V2 slice source: partition-per-slice planning,
  * executor-side fetch, custom-fetcher registration.
  */
class SliceSourceSpec extends SparkSpec {
  import spark.implicits._

  private def read(start: Long, end: Long, step: Long) =
    spark.read.format("graft.io.v2.SliceSource")
      .option("start", start).option("end", end).option("step", step).load()

  test("plans one input partition per slice (the parallel-ingest point)") {
    val df = read(0, 3000, 300)
    assert(df.rdd.getNumPartitions == 10)
    assert(df.count() == 10L * graft.io.v2.SliceSource.rowsPerSlice)
  }

  test("synthetic payload is deterministic and slice-stamped") {
    val a = read(600, 1200, 600).collect().map(_.toSeq).toSet
    val b = read(600, 1200, 600).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
    assert(read(0, 1800, 600).select($"slice_start").distinct()
      .as[Long].collect().sorted.toSeq == Seq(0L, 600L, 1200L))
  }

  test("a registered custom fetcher takes over payload production") {
    graft.io.v2.FetcherRegistry.register("fixed",
      (t, _) => s"app,metric,ts\nonly,1.5,$t\n")
    val df = spark.read.format("graft.io.v2.SliceSource")
      .option("start", 0).option("end", 900).option("step", 300)
      .option("fetcher", "fixed").load()
    val got = df.select($"app", $"metric", $"ts").as[(String, Double, Long)]
      .collect().toSet
    assert(got == Set(("only", 1.5, 0L), ("only", 1.5, 300L), ("only", 1.5, 600L)))
  }

  test("slice_start range filters prune partitions at planning time") {
    val pruned = read(0, 3600, 600).filter($"slice_start" >= 1800)
    assert(pruned.rdd.getNumPartitions == 3, "only slices 1800/2400/3000 should be planned")
    assert(pruned.select($"slice_start").distinct().as[Long].collect().sorted.toSeq
      == Seq(1800L, 2400L, 3000L))
    // non-aligned equality matches nothing (and plans nothing)
    assert(read(0, 3600, 600).filter($"slice_start" === 700).count() == 0)
    // aligned equality plans exactly one slice
    val one = read(0, 3600, 600).filter($"slice_start" === 1200)
    assert(one.rdd.getNumPartitions == 1 && one.count() == graft.io.v2.SliceSource.rowsPerSlice)
  }

  test("filters and projections apply on top of the source scan") {
    val n = read(0, 3600, 600).filter($"app" === "app0")
      .select(count(lit(1))).as[Long].head()
    assert(n == 6L * (graft.io.v2.SliceSource.rowsPerSlice / 5))
  }
}
