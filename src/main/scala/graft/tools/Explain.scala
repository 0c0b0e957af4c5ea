package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: dump formatted physical plans for the named queries (all
  * if no names given) — the SURVEY-mandated plan audit loop: check
  * PushedFilters reach scans, dims broadcast, codegen spans are wide.
  * Usage: tools/run.sh graft.tools.Explain [sfDir] [q1 q2 ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(8)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
