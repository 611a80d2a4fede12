package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared scaffolding for the "distributed order" operators (GlobalTopN,
  * GlobalRowNumber): range-repartition on the sort keys, tag rows with
  * their partition id, and bring ONLY the per-partition row counts (P
  * longs) to the driver.
  *
  * The ranged frame is persisted on purpose: the counts pass and the
  * caller's selection/numbering pass are separate QueryExecutions, and
  * Spark does not reuse exchanges across plans — an uncached two-pass
  * re-executes the caller's entire upstream. The pin is spill-safe
  * (MEMORY_AND_DISK), deduplicated by the cache manager's canonical-plan
  * key across identical re-runs, and bounded by the operator contract:
  * callers pass slim (key, ord) projections, not payload tables.
  */
private[ops] object RangedCounts {

  /** @param cum cumulative row counts: `cum(p)` = rows in partitions < p. */
  final case class Ranged(df: DataFrame, parts: Int, counts: Map[Int, Long], cum: IndexedSeq[Long]) {
    /** Release the MEMORY_AND_DISK pin. Safe once the caller has
      * materialized whatever it derived from `df` — a later action on a
      * derived frame recomputes (correct, just unpinned). Operators that
      * hand a derived frame to THEIR caller can't know when that is, so
      * they either keep the pin for the session (documented) or expose a
      * releasable variant that forwards this hook.
      */
    def unpersist(): Unit = { df.unpersist(); () }
  }

  def apply(df: DataFrame, ord: Seq[Column], pidCol: String = "_pid"): Ranged = {
    require(ord.nonEmpty, "ranged counts need at least one ordering column")
    val parts = math.max(1, df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val ranged = df
      .repartitionByRange(parts, ord: _*)
      .withColumn(pidCol, spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts: Map[Int, Long] = ranged.groupBy(pidCol).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cum = (0 until parts).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L)).toIndexedSeq
    Ranged(ranged, parts, counts, cum)
  }
}
