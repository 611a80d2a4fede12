package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftshim.Shim

/** Whole-operator custom plan: per-key top-k with bounded heaps.
  *
  * The idiomatic formulation — `row_number().over(Window.partitionBy(key)
  * .orderBy(...)) <= k` — sorts EVERY partition's full data before
  * discarding all but k rows per key. At 100 TB that sort dominates the
  * query. This operator keeps a size-k binary heap per key instead:
  *   - partial stage before the shuffle (map-side top-k: at most
  *     keys×k rows cross the wire),
  *   - final stage after hash-partitioning on the keys.
  * Memory is O(distinctKeysPerPartition × k); nothing is globally sorted.
  *
  * Surfaces exercised: custom LogicalPlan (UnaryNode) + Strategy +
  * SparkPlan with `requiredChildDistribution` (EnsureRequirements inserts
  * the single Exchange) — SURVEY §7.4's "(c) whole-operator" path.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan
) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val ordExprs = order
    val schema = child.output
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      // heap root = currently-worst retained row (reverse of the requested
      // order), so replacing the root keeps the best k
      val betterThan = RowOrdering.create(ordExprs, schema)
      val heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row).copy()
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1,
            (a: InternalRow, b: InternalRow) => betterThan.compare(b, a))
          heaps.put(key, heap)
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (betterThan.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      // partial (map-side) top-k feeds the final top-k; EnsureRequirements
      // inserts exactly one hash Exchange between them
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Install the strategy into the session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_ eq TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies = cur :+ TopKPerKeyStrategy
    }
  }

  /** Top `k` rows per `keyCols` group, ordered by `orderCols` (use
    * `col(...).desc` / `.asc`; include a full tiebreak for determinism).
    */
  def apply(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = Shim.logicalPlan(df)
    // resolve key names through df.col: honors spark.sql.caseSensitive
    // (a name→attribute map is case-sensitive and silently picks the last
    // duplicate) and raises a proper ambiguity error on duplicate names
    val keys = keyCols.map(n => Shim.catalystExpression(spark, df.col(n)))
    val order = orderCols.map { c =>
      // eager conversion: the lazy wrapper leaks non-serializable column
      // AST nodes into the physical plan's closures
      Shim.catalystExpression(spark, c) match {
        case so: SortOrder => so
        case e             => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    Shim.ofRows(spark, TopKPerKeyNode(keys, order, k, analyzed))
  }
}
