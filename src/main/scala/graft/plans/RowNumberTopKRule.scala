package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the idiomatic per-key top-k pattern
  *
  *   Project(cols…,                      // rn dropped here
  *     Filter(rn <= k,
  *       Window([row_number() AS rn] over (PARTITION BY p ORDER BY o), child)))
  *
  * into the bounded-heap `TopKPerKeyNode` — users write the window form,
  * the engine plans the operator that never sorts whole partitions.
  *
  * Deliberately conservative: fires only when the Window computes exactly
  * one expression, that expression is row_number with a non-empty order,
  * the filter is a simple `rn <= k` / `rn < k` / `rn = 1` on that column,
  * and the projection above drops the rn attribute (so the rewritten
  * plan's schema is unchanged).
  */
object RowNumberTopKRule extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(1, IntegerType)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
          Filter(cond, w @ Window(Seq(al @ Alias(WindowExpression(_: RowNumber, _), _)), part, order, child, _)))
        if order.nonEmpty && part.nonEmpty =>
      val rnAttr = al.toAttribute
      limitOf(cond, rnAttr) match {
        case Some(k) if k >= 1 && !projectList.exists(_.references.exists(_.semanticEquals(rnAttr))) =>
          Project(projectList, TopKPerKeyNode(part, order, k, child))
        case _ => p
      }
  }
}

object RowNumberTopK {
  /** Install rule + strategy into the session (idempotent). */
  def install(spark: SparkSession): Unit = {
    TopKPerKey.install(spark)
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq RowNumberTopKRule)) {
      spark.experimental.extraOptimizations = cur :+ RowNumberTopKRule
    }
  }
}
