package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: time one query repeatedly. tools/run.sh graft.tools.RunOne <name> [sfDir] [reps] */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.local()
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"$name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
