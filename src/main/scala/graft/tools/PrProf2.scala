package graft.tools
import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._
object PrProf2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = "/root/testdata/sf0.1"
    val t0 = System.nanoTime()
    val pairs = Tables(spark, dir).lineitem.select(
      concat(lit("p"), col("l_partkey")).as("p"),
      concat(lit("s"), col("l_suppkey")).as("sup")).distinct()
    val edges = pairs.select(col("p").as("src"), col("sup").as("dst"))
      .unionByName(pairs.select(col("sup").as("src"), col("p").as("dst")))
    val n = graft.ops.Graph.pageRank(edges, 3).count()
    println(f"op path: ${(System.nanoTime()-t0)/1e9}%.2f s, $n rows")
    spark.stop()
  }
}
