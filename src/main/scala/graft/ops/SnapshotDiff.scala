package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff between two versions of a keyed table — the regression
  * gate of a data pipeline: after a code change, "what did the new run
  * actually change?" asked of 100 TB has to come back as a keyed
  * added/removed/changed report, not a byte comparison.
  *
  * One full-outer join on the key, with change detection on an md5 row
  * fingerprint computed scan-side (so the join carries key + 32-byte
  * digest, not the full payload width, when `thin = true`).
  */
object SnapshotDiff {

  /** Per-key change classification between `before` and `after` (same
    * schema, unique key). Output: `(key..., change)` with change in
    * {added, removed, changed} — unchanged keys are dropped (at scale
    * they are the overwhelming bulk, and they are exactly the rows the
    * question is not about).
    *
    * @param thin project each side to (key, fingerprint) before the join:
    *             the shuffle then moves 32-byte digests instead of full
    *             rows. Keep false when callers want payload columns added
    *             downstream.
    */
  def diff(before: DataFrame, after: DataFrame, key: Seq[String],
           thin: Boolean = true): DataFrame = {
    require(key.nonEmpty, "diff needs a key")
    val payload = before.columns.filterNot(key.contains).toSeq
    require(payload.nonEmpty, "diff needs at least one non-key column")
    require(after.columns.sorted.sameElements(before.columns.sorted),
      "snapshot schemas must match")
    // null-safe canonical fingerprint: per column, name + explicit null
    // flag + coalesced value — null vs empty-string vs "null" map to
    // distinct streams. Callers diffing DOUBLE columns across engines
    // should decimal-cast them first (double-to-string rendering is
    // engine-specific; decimal rendering is not).
    def fp(df: DataFrame) = {
      val parts = payload.sorted.flatMap(c => Seq(
        lit(c),
        when(col(c).isNull, "1").otherwise("0"),
        coalesce(col(c).cast("string"), lit(""))))
      md5(concat_ws("", parts: _*))
    }
    val l = (if (thin) before.select(key.map(col) :+ fp(before).as("_fp_l"): _*)
             else before.withColumn("_fp_l", fp(before)))
    val r = after.select(key.map(col) :+ fp(after).as("_fp_r"): _*)
    l.join(r, key, "full_outer")
      .withColumn("change",
        when(col("_fp_l").isNull, "added")
          .when(col("_fp_r").isNull, "removed")
          .when(col("_fp_l") =!= col("_fp_r"), "changed"))
      .filter(col("change").isNotNull)
      .drop("_fp_l", "_fp_r")
  }
}
