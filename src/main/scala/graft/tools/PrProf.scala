package graft.tools
import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._
object PrProf {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val pairs = Tables(spark, dir).lineitem.select(
      concat(lit("p"), col("l_partkey")).as("p"),
      concat(lit("s"), col("l_suppkey")).as("sup")).distinct()
    val edges = pairs.select(col("p").as("src"), col("sup").as("dst"))
      .unionByName(pairs.select(col("sup").as("src"), col("p").as("dst")))
    val e = edges.withColumn("outdeg", count(lit(1))
      .over(org.apache.spark.sql.expressions.Window.partitionBy(col("src")))).cache()
    println("edge rows: " + t("e.count")(e.count()))
    val nodes = e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct().cache()
    val n = t("nodes.count")(nodes.count())
    println("nodes: " + n)
    var pr = t("init cp")(nodes.withColumn("pr", lit(1.0 / n)).localCheckpoint())
    for (i <- 1 to 3) {
      val contrib = e.join(pr, e("src") === pr("node"))
        .select(col("dst").as("node"), (col("pr") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("inc"))
      pr = t(s"round $i")(nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), (lit(0.15 / n) + lit(0.85) * coalesce(col("inc"), lit(0.0))).as("pr"))
        .localCheckpoint())
    }
    spark.stop()
  }
}
