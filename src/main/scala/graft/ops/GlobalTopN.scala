package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact, fully-distributed global top-n under a total order.
  *
  * `df.orderBy(...).limit(n)` plans a TakeOrderedAndProject that funnels
  * all n rows through the driver — fine for k-row heads, fatal when n is
  * "minority-class size" (billions at 100 TB, and `.toInt` overflows).
  * A global `Window.orderBy` sorts everything in ONE task. This instead:
  *
  *   1. range-repartitions on the sort key (Spark samples split points) —
  *      the same machinery as a distributed ORDER BY, all executor-side;
  *   2. collects only the P per-partition row COUNTS to the driver;
  *   3. keeps whole partitions strictly below the rank boundary (as a set —
  *      no sort needed), and row_number-filters ONLY the single partition
  *      straddling the boundary (the one sort that happens).
  *
  * Exactness does not depend on the (seeded, deterministic) range
  * sampling being balanced — skewed bounds only move work between
  * partitions. `ord` must be a total order for a deterministic result
  * (callers append a unique id as the last key).
  */
object GlobalTopN {

  def topN(df: DataFrame, n: Long, ord: Column*): DataFrame = {
    require(ord.nonEmpty, "topN needs at least one ordering column")
    if (n <= 0L) return df.limit(0)
    val parts = math.max(1, df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    // NOT cached, and NOT sorted: the per-partition counts depend only on
    // the range partitioning, so the count job and the result job share the
    // one shuffle (Spark reuses the map stage across jobs on this lineage);
    // only the single boundary partition ever gets sorted, inside its
    // row_number window. A cache here would pin a full copy of the input
    // per invocation for the session lifetime — the result is top-n AS A
    // SET, so intra-partition order is never needed for the kept-whole
    // partitions.
    val ranged = df
      .repartitionByRange(parts, ord: _*)
      .withColumn("_pid", spark_partition_id())
    val counts: Map[Int, Long] = ranged.groupBy("_pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cum = (0 until parts).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    // partitions fully inside the top-n …
    val fullParts = (0 until parts).filter(p => cum(p + 1) <= n)
    // … and the one straddling the boundary (if any)
    val boundary = (0 until parts).find(p => cum(p) < n && n < cum(p + 1))
    val whole = ranged.filter(col("_pid").isin(fullParts.map(Int.box): _*)).drop("_pid")
    boundary match {
      case None => whole
      case Some(pb) =>
        val w = Window.partitionBy("_pid").orderBy(ord: _*)
        val trimmed = ranged.filter(col("_pid") === pb)
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= n - cum(pb))
          .drop("_rn", "_pid")
        whole.unionByName(trimmed)
    }
  }
}
