package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, SortOrder}
import org.apache.spark.sql.graft.PlanBridge

/** DataFrame-level entry points for the custom logical operators in this
  * package. Column references are resolved against the input frame's
  * analyzed plan, so the constructed operator is fully resolved and the
  * analyzer only has to validate it.
  */
object NativeOps {

  /** Top-k rows per group through the native two-phase operator
    * ([[TopKPerGroup]]). `orderCols` are `(column, ascending)` pairs and
    * must form a TOTAL order within each group for deterministic output
    * (same contract as every row_number in this repo).
    *
    * Requires the session to carry `GraftExtensions` (injects
    * [[GraftStrategies]]); sessions built via `GraftSession` do.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      plan.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${plan.output.map(_.name).mkString(", ")}"))
    val group = groupCols.map(attr)
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    PlanBridge.ofRows(df.sparkSession, TopKPerGroup(group, order, k, plan))
  }
}
