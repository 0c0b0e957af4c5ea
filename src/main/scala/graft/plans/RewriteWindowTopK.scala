package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: the declarative top-k-per-group idiom
  *
  *   df.withColumn("rn", row_number().over(partitionBy(g).orderBy(o)))
  *     .filter($"rn" <= k).drop("rn")
  *
  * optimizes to the native [[TopKPerGroup]] operator whenever the rank
  * column is immediately discarded — the Project/Filter/Window shape
  * proves the rank was only a means to select rows. Users write the
  * standard window form; the plan gets heap selection with no sorts
  * (see [[TopKPerGroup]]). `rn === 1` (the deterministic-dedup idiom,
  * [[graft.ops.Aggregates.dedupKeepFirst]]) is top-1. Only row_number
  * qualifies: rank/dense_rank admit >k rows on ties, and a kept rank
  * column means the caller wants the number itself. Injected via
  * `GraftExtensions` after [[graft.expressions.RewriteHofDot]].
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  /** The alias's attribute iff the single window expression is a
    * canonical row_number (its frame is fixed by the analyzer).
    */
  private def rowNumberAttr(we: NamedExpression): Option[Attribute] = we match {
    case a @ Alias(WindowExpression(RowNumber(), _), _) => Some(a.toAttribute)
    case _ => None
  }

  private def kOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.exprId == rn.exprId => Some(v)
    case LessThan(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.exprId == rn.exprId => Some(v - 1)
    case EqualTo(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.exprId == rn.exprId && v == 1 => Some(1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: AttributeReference)
        if a.exprId == rn.exprId => Some(v)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, Filter(cond, w: Window))
        if w.windowExpressions.length == 1 && w.orderSpec.nonEmpty =>
      (for {
        rn <- rowNumberAttr(w.windowExpressions.head)
        k <- kOf(cond, rn)
        if k >= 1 &&
          // the rank must be discarded: neither the projection nor
          // anything else may consume it
          !projList.exists(_.references.contains(rn)) &&
          cond.references.subsetOf(AttributeSet(rn :: Nil))
      } yield Project(projList, TopKPerGroup(w.partitionSpec, w.orderSpec, k, w.child))
      ).getOrElse(p)
  }
}
