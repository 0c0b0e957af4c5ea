package graft.tools

import graft.{GraftSession, SparkEntry}
import com.codahale.metrics.Histogram

/** Dev harness (VERDICT r11 item 6): split each registered query's
  * wall into BUILD (the queries-map closure — includes any eager
  * contract probes/checkpoints), PLAN (analysis + optimization +
  * physical planning, forced via `executedPlan`), and EXECUTE (the
  * count action — includes whole-stage codegen compilation), plus the
  * JVM-wide Janino compile-time delta per query from CodegenMetrics.
  * Answers whether the sweep total is dominated by single-threaded
  * Catalyst/Janino fixed cost (amortizable only by warm reuse) or by
  * data movement (cuttable per query).
  *
  * Usage: tools/run.sh graft.tools.PlanSplit [sfDir] [name...]
  */
object PlanSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).collect()
    SparkEntry.stages.foreach { case (name, fn) =>
      try fn(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[plansplit] stage $name failed: ${e.getMessage}") }
    }
    spark.catalog.clearCache()
    val compileHist: Histogram =
      org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME
    var totB, totP, totE = 0.0
    var totN = 0L
    val rows = names.map { name =>
      val n0 = compileHist.getCount
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      try df.count() catch { case _: Throwable => () }
      val t3 = System.nanoTime()
      val nC = compileHist.getCount - n0
      spark.catalog.clearCache()
      System.gc()
      val (b, p, e) = ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      totB += b; totP += p; totE += e; totN += nC
      f"$name%-32s build=$b%7.3f plan=$p%7.3f exec=$e%7.3f codegen_n=$nC%4d"
    }
    rows.foreach(println)
    // mean Janino compile wall from the reservoir: count × mean gives
    // the ORDER of the sweep's total compile cost (approximation — the
    // reservoir samples; labelled as such in the analysis)
    val meanMs = compileHist.getSnapshot.getMean
    println(f"[plansplit] TOTAL build=$totB%.1f plan=$totP%.1f exec=$totE%.1f s; " +
      f"codegen compiles=$totN (mean ${meanMs}%.1f ms ≈ ${totN * meanMs / 1000.0}%.1f s, reservoir approx) " +
      f"over ${names.size} queries")
    spark.stop()
  }
}
