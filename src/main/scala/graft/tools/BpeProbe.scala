package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev harness (r13): stage-wise decomposition of the q_bpe_learn
  * cost — prep (wrap+checkpoint), per-round pair-count+argmax, and
  * per-round merge-apply+checkpoint — so the optimization attacks the
  * measured dominator instead of a guess (guide §1.2).
  * Usage: tools/run.sh graft.tools.BpeProbe <sfDir>
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val boundary = "#"
    def timed[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[bpeprobe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    // `explain` as the 2nd arg: dump the round-1 pair-count subtree
    // plans (old declarative vs kernel) instead of timing — the
    // learner's terminal plan is a LocalTableScan (driver loop), so
    // the per-round subtree IS the auditable plan.
    val explainOnly = args.length > 1 && args(1) == "explain"
    (1 to (if (explainOnly) 1 else 2)).foreach { iter =>
      println(s"[bpeprobe] --- iteration $iter ---")
      var w: DataFrame = timed("prep wrap+checkpoint") {
        Tables(spark, dir).documents.select(
          regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9]+", boundary),
            "(.)", "($1)").as("w")).localCheckpoint()
      }
      for (step <- 1 to (if (explainOnly) 1 else 3)) {
        val ss = split(btrim(col("w"), lit("()")), "\\)\\(")
        if (explainOnly) {
          println("[bpeprobe] ===== round pair-count subtree, OLD =====")
          w.select(explode(zip_with(
              slice(ss, lit(1), greatest(size(ss) - 1, lit(0))),
              slice(ss, lit(2), greatest(size(ss) - 1, lit(0))),
              (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
            .select(col("p.a").as("a"), col("p.b").as("b"))
            .filter(col("a") =!= boundary && col("b") =!= boundary)
            .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cnt"))
            .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
            .explain("formatted")
          println("[bpeprobe] ===== round pair-count subtree, KERNEL =====")
          w.select(explode(
              graft.expressions.TextSketchExpressions.adjPairCounts(col("w"))).as("e"))
            .groupBy(col("e.p").as("p")).agg(sum(col("e.c")).as("cnt"))
            .orderBy(col("cnt").desc, col("p")).limit(1)
            .explain("formatted")
          spark.stop(); return
        }
        val topOld = timed(s"round$step paircount OLD") {
          w.select(explode(zip_with(
              slice(ss, lit(1), greatest(size(ss) - 1, lit(0))),
              slice(ss, lit(2), greatest(size(ss) - 1, lit(0))),
              (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
            .select(col("p.a").as("a"), col("p.b").as("b"))
            .filter(col("a") =!= boundary && col("b") =!= boundary)
            .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cnt"))
            .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
            .collect().head
        }
        val topNew = timed(s"round$step paircount KERNEL") {
          w.select(explode(
              graft.expressions.TextSketchExpressions.adjPairCounts(col("w"))).as("e"))
            .groupBy(col("e.p").as("p")).agg(sum(col("e.c")).as("cnt"))
            .orderBy(col("cnt").desc, col("p")).limit(1)
            .collect().head
        }
        val Array(na, nb) = topNew.getString(0).split(' ')
        assert(topOld.getString(0) == na && topOld.getString(1) == nb &&
          topOld.getLong(2) == topNew.getLong(1),
          s"kernel argmax mismatch: old=(${topOld.getString(0)},${topOld.getString(1)}," +
            s"${topOld.getLong(2)}) new=($na,$nb,${topNew.getLong(1)})")
        val top = topOld
        val (a, b) = (top.getString(0), top.getString(1))
        if (step < 3)
          w = timed(s"round$step apply+checkpoint") {
            w.select(replace(col("w"),
              lit(s"($a)($b)"), lit(s"($a$b)")).as("w")).localCheckpoint()
          }
      }
    }
    spark.stop()
  }
}
