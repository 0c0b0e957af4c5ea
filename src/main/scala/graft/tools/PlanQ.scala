package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev harness: print the executed plan of named SparkEntry queries
  * after running them (AQE-final). Usage: PlanQ <sfDir> <name>...
  */
object PlanQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.local(32)
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      println(s"=== $name ===")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
