package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev harness: print the formatted physical plan of named queries
  * (usage: ExplainAudit <sfDir> <name>...) — the .explain-and-iterate
  * loop the build guide mandates, as a runnable artifact.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.local(8)
    args.drop(1).foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
