package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev harness: time named SparkEntry queries, N repetitions each, in
  * one warm JVM — separates real data cost from per-query planning /
  * codegen overhead (usage: ProfQ <sfDir> <reps> <name>...).
  */
object ProfQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = GraftSession.local(32)
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // Same discipline as Bench: shuffle/broadcast state from prior
        // reps is only reclaimed when the driver GCs the references
        // (ContextCleaner) — on a 64 GB heap that can be never, and at
        // sf1 the orphaned state compounds rep-over-rep (measured:
        // 82→192→427 s on one query whose quiet steady is ~70 s).
        // Collect it in the UNTIMED window.
        spark.catalog.clearCache()
        System.gc()
        dt
      }
      println(f"[profq] $name%-28s ${times.map(t => f"$t%6.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
