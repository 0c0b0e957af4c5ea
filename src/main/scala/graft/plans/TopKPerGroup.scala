package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator extension tier (SURVEY §2.F4 at scale): top-k rows per
  * group as a first-class logical operator with its own physical
  * strategy, registered through `SparkSessionExtensions`
  * (`injectPlannerStrategy`) — the escalation path for semantics the
  * built-in operators can't express efficiently.
  *
  * Why not the window form? Since 3.5 Spark's `InferWindowGroupLimit`
  * already bounds the shuffle of `row_number().over(...) <= k` — a
  * Partial WindowGroupLimit runs before the exchange (verified on this
  * build: tools.Explain q_topk_per_group). What it CANNOT remove is the pair of
  * full per-partition SORTS bracketing the exchange (WindowGroupLimit
  * and WindowExec both demand sorted input): O(n log n) over every map
  * partition of a 100 TB scan, again over the reduced side, plus a
  * materialized rank column. This operator plans as TWO physical
  * stages, exactly like partial/final hash aggregation, and replaces
  * both sorts with O(n log k) bounded-heap selection:
  *
  *   TopKPerGroupExec(final)            -- k per group, group-clustered
  *     +- Exchange hashpartitioning(g)  -- inserted by EnsureRequirements
  *        +- TopKPerGroupExec(partial)  -- ≤ k per (partition, group)
  *           +- child (UNSORTED — no Sort node anywhere in the plan)
  *
  * Shuffle volume matches the group-limited window form (≤ k ×
  * groups-per-partition rows); the saving is the scan-side n·log(n)
  * sort work, which dominates when partitions are large and k is small.
  * If the child is already hash-partitioned on the group keys (bucketed
  * table, prior repartition), `requiredChildDistribution` is satisfied
  * and NO exchange is inserted at all. At bench scale (sf0.1) the two
  * forms measure identically; the sort-vs-heap gap is a large-partition
  * property.
  *
  * Memory: each task holds at most k rows per distinct group key seen in
  * its partition — the same bound as map-side combine in hash
  * aggregation. For pathological cardinality (every row its own group)
  * the partial phase degrades to a pass-through copy, never worse than
  * the input.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Physical operator for [[TopKPerGroup]]. `partial = true` runs before
  * the exchange (any distribution accepted), `partial = false` declares
  * `ClusteredDistribution(groupExprs)` so EnsureRequirements co-locates
  * each group — or skips the shuffle when the child already satisfies it.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  // SQL-UI metrics: how hard the partial phase cut the stream is THE
  // number an operator like this lives or dies by at scale
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "output rows"),
    "numDroppedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "rows dropped by the heap cut"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupE = groupExprs
    val orderE = order
    val childOutput = child.output
    val outRows = longMetric("numOutputRows")
    val droppedRows = longMetric("numDroppedRows")
    child.execute().mapPartitions({ iter =>
      // Codegen'd key projection + row ordering, compiled on the executor.
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val ord: Ordering[InternalRow] = new LazilyGeneratedOrdering(orderE, childOutput)
      // Max-heap per group under the sort order: head is the worst
      // retained row; a new row replaces it iff it sorts strictly
      // earlier. Keeps the k FIRST rows of the group's sort order —
      // identical semantics to row_number() <= k under a total order.
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      var seen = 0L
      while (iter.hasNext) {
        val row = iter.next()
        seen += 1
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kLocal) heap.enqueue(row.copy())
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            val heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap) // projection reuses its buffer — copy the key
        }
      }
      val kept = heaps.valuesIterator.map(_.size.toLong).sum
      outRows += kept
      droppedRows += seen - kept
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner strategy: [[TopKPerGroup]] → partial + final [[TopKPerGroupExec]].
  * Injected via `GraftExtensions` (`injectPlannerStrategy`).
  */
object GraftStrategies extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
