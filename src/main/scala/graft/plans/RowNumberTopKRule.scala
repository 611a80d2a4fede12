package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
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
  * partition/order expressions are DETERMINISTIC (the operator evaluates
  * them independently in the partial stage, the shuffle hash, and the
  * final stage — rand()-keyed windows must keep the window plan), the
  * filter is a simple `rn <= k` / `rn < k` / `rn = 1` with k bounded (big
  * k means O(k)-per-key heaps; the sort-based plan is the right one), and
  * the projection above drops the rn attribute (so the rewritten plan's
  * schema is unchanged). If Spark's InferWindowGroupLimit already inserted
  * a WindowGroupLimit below the Window (same specs), it is stripped — the
  * heap operator subsumes its prefilter, and keeping it would drag both
  * of its per-partition sorts back into the plan.
  */
object RowNumberTopKRule extends Rule[LogicalPlan] {

  /** Above this the per-key heap working set stops being "small"; keep the
    * spill-able sort-based window plan (mirrors the spirit of Spark's own
    * windowGroupLimitThreshold).
    */
  private val maxRewriteK = 10000

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k)
    // guard the Int.MinValue boundary: k-1 would wrap to Int.MaxValue and
    // turn an always-empty filter into top-2147483647 per key
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) && k > Int.MinValue => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(1, IntegerType)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
          Filter(cond, w @ Window(Seq(al @ Alias(WindowExpression(_: RowNumber, _), _)), part, order, child, _)))
        if order.nonEmpty && part.nonEmpty &&
          part.forall(_.deterministic) && order.forall(_.deterministic) =>
      val rnAttr = al.toAttribute
      limitOf(cond, rnAttr) match {
        case Some(k) if k >= 1 && k <= maxRewriteK &&
            !projectList.exists(_.references.exists(_.semanticEquals(rnAttr))) =>
          // InferWindowGroupLimit (an earlier batch) may have inserted its
          // prefilter below the window; the heap operator computes the
          // same bound, so build over ITS child to drop the two sorts it
          // would otherwise force
          val base = child match {
            case WindowGroupLimit(gPart, gOrder, _, _, grandChild)
                if gPart == part && gOrder == order => grandChild
            case other => other
          }
          Project(projectList, TopKPerKeyNode.normalized(part, order, k, base))
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
