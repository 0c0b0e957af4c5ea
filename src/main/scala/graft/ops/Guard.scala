package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

/** Scale linting: inspect a query's physical plan for the shapes that
  * are fine on a laptop and fatal on a 1000-executor cluster, BEFORE
  * running it. The repo's test suite enforces these invariants on its
  * own queries ([[graft]] `PlanShapeSpec`); this is the same check as
  * a library API, for user queries.
  *
  * Flags:
  *  - cartesian products (partitions × partitions work),
  *  - window functions with an EMPTY partition spec (the whole dataset
  *    funnels through one task),
  *  - single-partition shuffle exchanges (a global funnel that is not
  *    the final collect).
  */
object Guard {

  /** Human-readable problems found in `df`'s physical plan; empty when
    * the plan is scale-clean.
    */
  def problems(df: DataFrame): Seq[String] = {
    def walk(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children.flatMap(walk) ++ (p match {
        case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
        case _ => Seq.empty
      }))
    walk(df.queryExecution.executedPlan).flatMap {
      case _: CartesianProductExec =>
        Some("cartesian product: every left partition pairs with every right partition")
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Some("window over the WHOLE dataset (empty PARTITION BY): single-task bottleneck")
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        Some("single-partition shuffle: the full dataset funnels through one task")
      case _ => None
    }.distinct
  }

  /** Throws `IllegalStateException` listing every problem when the plan
    * is not scale-clean. Call before `.write`/`.collect` on queries
    * built from untrusted input.
    */
  def assertScalable(df: DataFrame): Unit = {
    val ps = problems(df)
    if (ps.nonEmpty)
      throw new IllegalStateException(
        s"plan will not scale:\n  - ${ps.mkString("\n  - ")}")
  }

  /** RUNTIME width guard for operators whose cost is quadratic (or
    * worse) in a group's row count — pair expansions, per-group
    * self-joins. Returns `df` unchanged when every `keys` group holds
    * at most `limit` rows; otherwise the job FAILS FAST with the
    * offending group named, instead of silently materializing a
    * 10⁹-row blowup because someone pointed a bounded-width operator
    * at per-minute data. Costs one windowed count over the SAME
    * partitioning the downstream group operation needs, so with
    * matching keys Catalyst reuses the exchange. The guard rides
    * inside the plan (no driver-side count/collect): `assert_true`
    * evaluates per row and the `isNull` filter keeps it from being
    * pruned.
    */
  def maxGroupWidth(df: DataFrame, keys: Seq[String], limit: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    df.withColumn("__gw", count(lit(1)).over(w))
      .filter(assert_true(col("__gw") <= limit,
        concat(lit(s"group width exceeds $limit rows for key ("),
          concat_ws(",", keys.map(k => col(k).cast("string")): _*), lit(")")))
        .isNull)
      .drop("__gw")
  }
}
