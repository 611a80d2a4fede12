package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing for LLM pretraining batches: order the
  * corpus by a deterministic key, lay documents end-to-end on one global
  * token axis, and chop that axis into fixed-`budget` context windows.
  * Each document gets its global start offset and the [first, last]
  * window range it lands in (a doc longer than the remaining room simply
  * spans the boundary — exactly how packed pretraining shards are cut).
  *
  * The core is a GLOBAL cumulative sum under a total order. The naive
  * `sum().over(Window.orderBy(ord))` plans a single-partition window —
  * every row through ONE task, dead at 100 TB. Same cure as
  * [[GlobalRowNumber]]:
  *
  *   1. range-repartition on the order key (executor-side sampled splits);
  *   2. bring only the P per-partition TOKEN TOTALS to the driver;
  *   3. per-partition local cumsum (parallel windows) + the partition's
  *      cumulative token offset from a literal map.
  *
  * Two passes ⇒ the ranged frame is pinned MEMORY_AND_DISK for the
  * duration (Spark does not reuse exchanges across QueryExecutions); the
  * returned frame stays correct after [[Packed.unpersist]], it just
  * recomputes.
  */
object SequencePacking {

  final case class Packed(df: DataFrame, release: () => Unit)

  /** @param tokenCol  per-doc token count (non-negative; nulls treated as 0)
    * @param budget    tokens per packed context window (> 0)
    * @param ord       total order for the layout (append a unique key —
    *                  doc_id — or ties make offsets nondeterministic)
    */
  def packWindows(
      docs: DataFrame, tokenCol: Column, budget: Long, ord: Column*): Packed = {
    require(budget > 0, s"window budget must be positive, got $budget")
    require(ord.nonEmpty, "packing needs at least one ordering column")
    val parts = math.max(1,
      docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val ranged = docs
      .withColumn("_tok", coalesce(tokenCol.cast("long"), lit(0L)))
      .repartitionByRange(parts, ord: _*)
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // P longs to the driver — partition token totals, not rows
    val totals: Map[Int, Long] = ranged.groupBy("_pid").agg(sum("_tok").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = (0 until parts)
      .scanLeft(0L)((acc, p) => acc + totals.getOrElse(p, 0L))
      .zipWithIndex.map { case (off, p) => p -> off }.toMap
    val w = Window.partitionBy("_pid").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val endOff = sum(col("_tok")).over(w) + element_at(typedlit(offsets), col("_pid"))
    val packed = ranged
      .withColumn("_end", endOff)
      .withColumn("start_off", col("_end") - col("_tok"))
      // empty docs occupy no room: they sit AT start_off in the window that
      // offset falls in; last_win = first_win keeps the range well-formed
      .withColumn("first_win", floor(col("start_off") / budget))
      .withColumn("last_win",
        when(col("_tok") > 0, floor((col("_end") - 1) / budget))
          .otherwise(floor(col("start_off") / budget)))
      .drop("_tok", "_pid", "_end")
    Packed(packed, () => { ranged.unpersist(); () })
  }
}
