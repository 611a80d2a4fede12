package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's analytical core: per-entity time-ordered windowing that
  * derives each event's *next* event, skips over an excluded type, and
  * labels rows whose next event falls within a horizon.
  *
  * Reference semantics (Hap880_Final_Project.py:39-86):
  *   1. sort [entity, time]                                (py:39)
  *   2. lead(time), lead(type) per entity                  (py:43-45)
  *   3. null both where lead(type) == excluded             (py:48-50)
  *   4. per-entity backfill (next non-null *following*)    (py:56-59)
  *      — an excluded next event is skipped and the one after it counts
  *   5. days_next = (next_time - anchor_time) fractional   (py:63)
  *   6. label '1' iff days_next < horizon (null→'0')       (py:86)
  *
  * Scale notes: both window steps share the same partition key, so
  * Catalyst plans a SINGLE hash-partition Exchange on `entityCol` followed
  * by one sort — no second shuffle for the backfill. At 100 TB the only
  * cost is that one shuffle; per-entity history is assumed to fit an
  * executor (admissions-per-patient-shaped data, bounded per key).
  */
object CohortOps {

  /** Adds next_time / next_type / days_next / label columns. `tieCol`
    * breaks time ties so the result is deterministic regardless of the
    * incoming row order (the reference relies on physical row order; a
    * distributed engine must never do that — SURVEY §7.5.4).
    *
    * `anchorCol` is the timestamp `days_next` counts FROM — the reference
    * measures NEXT_ADMITTIME − DISCHTIME (py:63), i.e. ordering by admit
    * time but anchoring the gap on discharge. Defaults to `timeCol` for
    * schemas with a single event timestamp (the TPC-H analog queries).
    */
  def labelNextEvent(
      df: DataFrame,
      entityCol: String,
      timeCol: String,
      typeCol: String,
      tieCol: String,
      excludedType: String,
      horizonDays: Double,
      outPrefix: String = "",
      anchorCol: String = ""
  ): DataFrame = {
    val anchor = if (anchorCol.isEmpty) timeCol else anchorCol
    val w    = Window.partitionBy(entityCol).orderBy(col(timeCol), col(tieCol))
    val wFwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val nt   = s"${outPrefix}next_time"
    val nty  = s"${outPrefix}next_type"
    val days = s"${outPrefix}days_next"
    val lab  = s"${outPrefix}label"
    df.withColumn(nt, lead(col(timeCol), 1).over(w))
      .withColumn(nty, lead(col(typeCol), 1).over(w))
      // capture next_type BEFORE the null-out (py:48-50 order), then skip
      // excluded next events by nulling and backfilling from the suffix.
      // The two backfills are deliberately COLUMN-INDEPENDENT — pandas
      // bfill works per column, so with null values in timeCol the
      // (next_time, next_type) pair can come from different rows in BOTH
      // engines; reference-faithful, and a non-issue when timeCol is
      // non-null (the cohort precondition)
      .withColumn(nt, when(col(nty) === excludedType, lit(null)).otherwise(col(nt)))
      .withColumn(nty, when(col(nty) === excludedType, lit(null)).otherwise(col(nty)))
      .withColumn(nt, first(col(nt), ignoreNulls = true).over(wFwd))
      .withColumn(nty, first(col(nty), ignoreNulls = true).over(wFwd))
      .withColumn(days, (unix_timestamp(col(nt)) - unix_timestamp(col(anchor))) / 86400.0)
      // NaN/null days compare false → '0', matching np.where semantics (py:86)
      .withColumn(lab, when(col(days) < horizonDays, "1").otherwise("0"))
  }

  /** Fractional-day difference, reference E3 (py:63): total_seconds()/86400,
    * NOT datediff — the reference keeps fractional days.
    */
  def fractionalDays(later: Column, earlier: Column): Column =
    (unix_timestamp(later) - unix_timestamp(earlier)) / 86400.0
}
