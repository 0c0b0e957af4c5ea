package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev smoke: run the flagship entry + every query on sf0.001 and print
  * row counts. Catches analysis errors fast without the full oracle loop.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local()
    val n = SparkEntry.entry(spark).count()
    println(s"entry: $n rows")
    require(n > 0, "entry returned no rows")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      println(s"$name: ${fn(spark, sfDir).count()} rows")
    }
    spark.stop()
  }
}
