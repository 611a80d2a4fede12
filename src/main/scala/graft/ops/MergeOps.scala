package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history builder — the table-
  * maintenance operator behind incremental ingestion: fold a stream of
  * versioned records (base snapshot ∪ CDC updates) into per-key validity
  * intervals, collapsing no-change updates.
  *
  * The reference works on static extracts; a production readmission
  * pipeline re-ingests ADT feeds daily, and "what was this patient's
  * ward AS OF the prediction time" is exactly an SCD2 lookup (pairs with
  * [[AsOfJoin]] on the consumption side).
  */
object MergeOps {

  /** Fold versioned records into SCD2 intervals.
    *
    * Input: one row per (key, ts) observation carrying the tracked
    * attribute columns. Output: one row per RETAINED version with
    * `valid_from`, `valid_to` (null = open) and `is_current`, where a
    * version whose tracked attributes all equal its predecessor's is
    * collapsed into that predecessor (its interval simply extends).
    *
    * Scale shape: ONE `Exchange hashpartitioning(key)` feeds everything —
    * the change-detection lag, the filter, and the validity lead run
    * under the same partitioning + ordering, so Catalyst plans a single
    * shuffle and a single sort; the filter between the two windows
    * preserves order. No driver state, no self-join.
    *
    * @param ts must be unique per key (one observation per key per
    *           instant); enforced upstream by the ingestion's dedup.
    */
  def scd2(snapshots: DataFrame, key: String, ts: String, tracked: Seq[String]): DataFrame = {
    require(tracked.nonEmpty, "SCD2 needs at least one tracked column")
    val working = Seq("_prev_ts", "_chg", "valid_from", "valid_to", "is_current")
    val clash = snapshots.columns.filter(working.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(",")} collide with scd2 output columns")
    val w = Window.partitionBy(col(key)).orderBy(col(ts))
    // null-safe change test: a version differs from its predecessor if any
    // tracked column is NOT <=>-equal; the first version per key (lag ts
    // is null) is always retained
    val changed = tracked
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    val kept = snapshots
      .withColumn("_prev_ts", lag(col(ts), 1).over(w))
      .withColumn("_chg", changed)
      .filter(col("_prev_ts").isNull || col("_chg"))
      .drop("_prev_ts", "_chg")
    kept
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** CDC compaction: latest record per key wins (ties broken by `tie`).
    * The "merge on read" half of an upsert — one bounded-state pass via
    * the same partitioning as [[scd2]].
    */
  def upsertLatest(snapshots: DataFrame, key: String, ts: String, tie: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts).desc, col(tie).desc)
    snapshots
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** CDC application WITH delete tombstones: latest record per key wins,
    * and a key whose winning record is a delete (`opCol = deleteOp`)
    * disappears from the materialized table — the right-to-be-forgotten /
    * retention-purge propagation path a GDPR-compliant lakehouse needs.
    *
    * Filtering AFTER the latest-wins selection (not before) is the
    * correctness point: a delete followed by a later re-insert must
    * resurrect the key, and an early filter would lose the tombstone's
    * ability to shadow older versions. Same single (key) exchange as
    * [[upsertLatest]]; batching-invariant because "latest" is associative.
    */
  def applyCdc(
      records: DataFrame, key: String, ts: String, tie: String,
      opCol: String, deleteOp: String = "D"): DataFrame =
    upsertLatest(records, key, ts, tie).filter(col(opCol) =!= deleteOp)
}
