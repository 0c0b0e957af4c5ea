package graft.tools

import graft.GraftSession

/** Dev harness: run TrainingPrep.runV2 in DURABLE stage-boundary mode
  * (usage: PrepStages <sfDir> <outDir>) — writes stage0/1/2 parquet
  * boundaries plus the final chunk table under outDir. Feeds the
  * STAGE-WISE sf10 oracle adjudication (tools/prep_check.py): each
  * DuckDB stage replay reads the previous stage's Spark dump as a
  * pre-staged input, so no single replay statement carries the whole
  * 9-stage cascade (the r10 monolithic replay exceeded 2700 s).
  */
object PrepStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val out = graft.pipelines.TrainingPrep.runV2(
      graft.Tables(spark, sfDir).documents, stageDir = Some(outDir))
    out.coalesce(1).write.mode("overwrite").parquet(s"$outDir/final")
    spark.stop()
  }
}
