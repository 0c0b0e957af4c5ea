package graft.tools

import graft.GraftSession

/** Dev harness: run an ad-hoc SQL string against a GraftSession
  * (usage: SqlTry "<sql>"). Prints schema + up to 20 rows.
  */
object SqlTry {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    args.foreach { sql =>
      val df = spark.sql(sql)
      df.printSchema()
      df.show(20, truncate = false)
    }
    spark.stop()
  }
}
