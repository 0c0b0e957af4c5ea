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
    // per-rep shuffle/spill accounting (r13): distinguishes "the plan
    // shuffles more" from "the same shuffle no longer fits its slot"
    // when decade walls grow faster than row counts
    val shufW = new java.util.concurrent.atomic.AtomicLong
    val shufR = new java.util.concurrent.atomic.AtomicLong
    val spillD = new java.util.concurrent.atomic.AtomicLong
    val spillM = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            spillD.addAndGet(m.diskBytesSpilled)
            spillM.addAndGet(m.memoryBytesSpilled)
          }
        }
      })
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { rep =>
        val (w0, r0, d0, m0) = (shufW.get, shufR.get, spillD.get, spillM.get)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        def gb(x: Long) = x / 1e9
        System.err.println(f"[profq-io] $name rep$rep shuf_w=${gb(shufW.get - w0)}%.1fGB " +
          f"shuf_r=${gb(shufR.get - r0)}%.1fGB spill_disk=${gb(spillD.get - d0)}%.1fGB " +
          f"spill_mem=${gb(spillM.get - m0)}%.1fGB")
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
