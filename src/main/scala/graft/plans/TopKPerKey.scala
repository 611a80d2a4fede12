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
  *     keys×k rows cross the wire), with a key-cardinality flush bound —
  *     partial top-k is re-aggregatable, so when the heap map grows past
  *     `maxPartialKeys` it emits and clears instead of growing unbounded;
  *   - final stage after hash-partitioning on the keys. The final stage's
  *     working set is O(distinctKeysInPartition × k) UNTRACKED JVM heap
  *     (like a hash aggregate without spilling) — appropriate for small k
  *     and bounded key cardinality, which the optimizer rule enforces by
  *     only rewriting k ≤ 10000; pathological cases keep the sort-based
  *     window plan.
  *
  * Grouping keys are floating-point-NORMALIZED at node construction
  * (-0.0 → 0.0, canonical NaN) — byte-equality grouping and hash
  * partitioning would otherwise split one logical key (the optimizer's
  * NormalizeFloatingNumbers rule only knows builtin operators).
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
  require(k >= 1, s"TopKPerKeyNode requires k >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyNode {
  /** Construct with float/double grouping keys normalized. */
  def normalized(
      keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan): TopKPerKeyNode =
    TopKPerKeyNode(keys.map(Shim.normalizeFloats), order, k, child)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan
) extends UnaryExecNode {

  /** Bound on the partial stage's heap map: past this many distinct keys
    * the stage flushes (emits and clears). Emitting a key more than once
    * from the partial stage is correct — the final stage re-aggregates —
    * so this caps memory at maxPartialKeys×k rows without a spill path.
    */
  private val maxPartialKeys = 1 << 18

  override def nodeName: String = if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

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
    val isPartial = partial
    val flushAt = maxPartialKeys
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      // heap root = currently-worst retained row (reverse of the requested
      // order), so replacing the root keeps the best k
      val betterThan = RowOrdering.create(ordExprs, schema)
      var heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
      import scala.jdk.CollectionConverters._

      def drain(m: java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]) =
        m.values().iterator().asScala.flatMap(_.iterator().asScala)

      val flushed = Iterator.unfold(iter) { it =>
        if (!it.hasNext) None
        else {
          var out: Iterator[InternalRow] = Iterator.empty
          while (it.hasNext && out.isEmpty) {
            val row = it.next()
            // probe with the REUSED projection buffer; copy only on miss
            val probe = keyProj(row)
            var heap = heaps.get(probe)
            if (heap == null) {
              // PriorityQueue grows dynamically — never eagerly size to k
              // (k can be huge; kk+1 can even overflow)
              heap = new java.util.PriorityQueue[InternalRow](math.min(kk, 15) + 1,
                (a: InternalRow, b: InternalRow) => betterThan.compare(b, a))
              heaps.put(probe.copy(), heap)
              if (isPartial && heaps.size() > flushAt) {
                val old = heaps
                heaps = new java.util.HashMap()
                val kept = old.remove(probe) // keep the fresh key's heap live
                heaps.put(probe.copy(), kept)
                out = drain(old)
              }
            }
            if (heap.size < kk) heap.add(row.copy())
            else if (betterThan.compare(row, heap.peek()) < 0) {
              heap.poll(); heap.add(row.copy())
            }
          }
          Some((out, it))
        }
      }.flatten
      flushed ++ drain(heaps)
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
    * k <= 0 returns an empty frame (like `rn <= 0` on the window form).
    */
  def apply(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], k: Int): DataFrame = {
    if (k <= 0) return df.limit(0)
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
    Shim.ofRows(spark, TopKPerKeyNode.normalized(keys, order, k, analyzed))
  }
}
