package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.functions._

/** Dev tool: print the flagship entry's golden checksum (see
  * GoldenSpec) for re-recording after intentional semantic changes.
  */
object Golden {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val entry = SparkEntry.entry(spark)
    val checksum = entry
      .select(xxhash64(entry.columns.map(col): _*).as("h"))
      .agg(expr("bit_xor(h)")).head().getLong(0)
    println(s"rows=${entry.count()} checksum=${checksum}L")
    spark.stop()
  }
}
