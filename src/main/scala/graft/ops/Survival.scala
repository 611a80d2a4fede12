package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival analysis — the time-to-event risk table.
  *
  * Input: one row per subject with a duration (time observed) and an
  * event flag (true = the event happened at `duration`; false = the
  * subject was censored then — observation ended without the event).
  * Output: one row per distinct event/censor time t with the classic KM
  * risk-table columns —
  *
  *   - `n_risk`   subjects still at risk entering t (duration ≥ t),
  *   - `n_event`  events AT t,
  *   - `n_censor` censorings AT t.
  *
  * The survival estimate S(t) = Π_{t'≤t} (1 − d_{t'}/n_{t'}) is a
  * cumulative float product whose value every caller can fold from
  * these exact integers; emitting the integers keeps the operator's
  * output bit-portable across engines (a distributed float product has
  * no order-independent exact form).
  *
  * Scale shape: ONE hash aggregation keyed on duration (the only
  * data-sized shuffle), then a window over the per-timepoint rows. That
  * window is unpartitioned BY CONSTRUCTION — its input is one row per
  * distinct timepoint (days, visits), bounded by the time domain, not
  * by subject count; 100 TB of subjects still collapse to thousands of
  * timepoint rows before the window runs.
  */
object Survival {

  def kmTable(subjects: DataFrame, durationCol: Column, eventCol: Column): DataFrame = {
    val perT = subjects
      .select(durationCol.as("t"), eventCol.cast("boolean").as("_ev"))
      .groupBy("t")
      .agg(
        sum(when(col("_ev"), 1L).otherwise(0L)).as("n_event"),
        sum(when(col("_ev"), 0L).otherwise(1L)).as("n_censor"))
    // subjects at risk entering t = total − everyone who exited earlier;
    // bounded input: one row per distinct t (see scaladoc)
    val exits = col("n_event") + col("n_censor")
    val all = Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val before = Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding, -1)
    perT.withColumn("n_risk",
        sum(exits).over(all) - coalesce(sum(exits).over(before), lit(0L)))
      .select("t", "n_risk", "n_event", "n_censor")
  }

  /** DuckDB mirror of [[kmTable]] over a (duration, event) subquery. */
  def kmOracleSql(subjectsSql: String): String =
    s"""WITH per_t AS (
       |  SELECT t,
       |         CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS n_event,
       |         CAST(sum(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS n_censor
       |  FROM ($subjectsSql) GROUP BY 1
       |)
       |SELECT t,
       |       CAST(sum(n_event + n_censor) OVER () -
       |            coalesce(sum(n_event + n_censor) OVER (
       |              ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |            AS BIGINT) AS n_risk,
       |       n_event, n_censor
       |FROM per_t""".stripMargin
}
