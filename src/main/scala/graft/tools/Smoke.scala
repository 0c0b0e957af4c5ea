package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev smoke: run the flagship entry + every query on sf0.001 and print
  * row counts. Catches analysis errors fast without the full oracle loop.
  *
  * Runs with `spark.sql.codegen.fallback=false`: a whole-stage-codegen
  * compile failure (e.g. an expression unrolled past the JVM's 64 KB
  * method limit) normally degrades SILENTLY to interpreted execution —
  * correct results, logged error, hot path orders slower. Here it
  * fails the smoke instead, so codegen regressions surface per-query.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local()
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val n = SparkEntry.entry(spark).count()
    println(s"entry: $n rows")
    require(n > 0, "entry returned no rows")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      println(s"$name: ${fn(spark, sfDir).count()} rows")
    }
    spark.stop()
  }
}
