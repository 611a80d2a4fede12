package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed inclusive running sum under a total order — the cumulative
  * analog of [[GlobalRowNumber]] for integer-valued measures (counts,
  * cents, bytes, tokens). `sum(v).over(Window.orderBy(ord))` is the
  * correct declaration but plans a SinglePartition window — every row
  * through one task, dead at 100 TB. Cure (the [[SequencePacking]] /
  * GlobalRowNumber shape):
  *
  *   1. range-repartition on the sort keys (executor-side sampled splits);
  *   2. bring only the P per-partition VALUE TOTALS to the driver;
  *   3. local per-partition cumsum (parallel windows) + the partition's
  *      cumulative offset from a broadcast literal map.
  *
  * Two passes over the input ⇒ the ranged frame is pinned
  * MEMORY_AND_DISK; call the release hook once the result is
  * materialized (later actions recompute — correct, just unpinned).
  */
object RunningTotal {

  /** @return (frame + `outCol` = inclusive running sum of `value` in
    *         `ord` order, grand total, release hook). `value` is cast to
    *         long (nulls → 0); `ord` must be a total order (append a
    *         unique key) or the prefix sums are nondeterministic.
    */
  def withRunningSum(
      df: DataFrame, value: Column, outCol: String,
      ord: Column*): (DataFrame, Long, () => Unit) = {
    require(ord.nonEmpty, "running sum needs at least one ordering column")
    val parts = math.max(1,
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val ranged = df
      .withColumn("_rt_v", coalesce(value.cast("long"), lit(0L)))
      .repartitionByRange(parts, ord: _*)
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // P longs to the driver — partition value totals, not rows
    val totals: Map[Int, Long] = ranged.groupBy("_pid").agg(sum("_rt_v").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = (0 until parts)
      .scanLeft(0L)((acc, p) => acc + totals.getOrElse(p, 0L))
      .zipWithIndex.map { case (off, p) => p -> off }.toMap
    val grand = (0 until parts).map(totals.getOrElse(_, 0L)).sum
    val w = Window.partitionBy("_pid").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = ranged
      .withColumn(outCol,
        sum(col("_rt_v")).over(w) + element_at(typedlit(offsets), col("_pid")))
      .drop("_rt_v", "_pid")
    (out, grand, () => { ranged.unpersist(); () })
  }
}
