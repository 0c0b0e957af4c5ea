package graft.tools
import graft.{GraftSession, SparkEntry}
object GuardSweep {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val sfDir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val ps = graft.ops.Guard.problems(fn(spark, sfDir))
        if (ps.nonEmpty) println(s"FLAG $name: ${ps.mkString(" | ")}")
      } catch { case e: Throwable => println(s"ERR  $name: ${e.getMessage.take(80)}") }
    }
    println("sweep done")
    spark.stop()
  }
}
