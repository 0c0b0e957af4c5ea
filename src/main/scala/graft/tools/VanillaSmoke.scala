package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev probe: entry() must work on a driver-default session (no graft configs). */
object VanillaSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    println("entry rows (vanilla session): " + graft.SparkEntry.entry(spark).count())
    spark.stop()
  }
}
