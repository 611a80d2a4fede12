package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series primitives over an event stream: fixed-horizon rolling
  * aggregates and regular-grid gap-filling with forward fill. The
  * reference's interval arithmetic (admission-to-admission day gaps,
  * Hap880_Final_Project.py:63) is a point diff; these are the windowed
  * forms a feature pipeline needs — trailing-24h activity counters,
  * dense daily panels for per-entity features.
  *
  * Scale shape: both operators take ONE hash exchange on the entity key.
  * The rolling aggregate is a RANGE frame over epoch seconds — streaming
  * accumulation inside each sorted partition, no self-join, no per-row
  * probe, state bounded by the horizon. The gap-fill grid comes from
  * sequence()+explode, so it materializes executor-side per entity
  * (never a driver loop), and the forward fill is one more window over
  * the same entity partitioning.
  *
  * Determinism: value sums ride round(·,6) → DECIMAL(18,6) accumulation,
  * so results are partition-order- and engine-independent; event times
  * are second-truncated (sub-second precision differs across storage
  * engines and a 24-hour feature should not hinge on it).
  */
object TimeSeriesOps {

  /** Trailing-horizon rolling sum + count per event: for each row, the
    * aggregate over the entity's events in `(t − horizonSec, t]`
    * (inclusive current, second resolution). Output columns:
    * (idCol, userCol, roll_sum, roll_n).
    */
  def rollingAgg(
      events: DataFrame, userCol: String, tsCol: String, valueCol: String,
      idCol: String, horizonSec: Long): DataFrame = {
    require(horizonSec > 0, "rollingAgg needs a positive horizon")
    val sec = unix_timestamp(date_trunc("second", col(tsCol)))
    val v = round(col(valueCol), 6).cast("decimal(18,6)")
    val w = Window.partitionBy(col(userCol)).orderBy(col("_sec"))
      .rangeBetween(-(horizonSec - 1), 0)
    events
      .select(col(idCol), col(userCol), sec.as("_sec"), v.as("_v"))
      .select(col(idCol), col(userCol),
        sum("_v").over(w).cast("double").as("roll_sum"),
        count(lit(1)).over(w).as("roll_n"))
  }

  /** DuckDB mirror of [[rollingAgg]] — generated from the same horizon so
    * the two can't drift. */
  def rollingAggOracleSql(
      table: String, userCol: String, tsCol: String, valueCol: String,
      idCol: String, horizonSec: Long): String =
    s"""WITH e AS (
       |  SELECT $idCol, $userCol,
       |         CAST(epoch(date_trunc('second', $tsCol)) AS BIGINT) AS sec,
       |         CAST(round($valueCol, 6) AS DECIMAL(18,6)) AS v
       |  FROM $table
       |)
       |SELECT $idCol, $userCol,
       |       CAST(SUM(v) OVER w AS DOUBLE) AS roll_sum,
       |       COUNT(*) OVER w AS roll_n
       |FROM e
       |WINDOW w AS (PARTITION BY $userCol ORDER BY sec
       |             RANGE BETWEEN ${horizonSec - 1} PRECEDING AND CURRENT ROW)""".stripMargin

  /** Trailing-window z-score anomaly flag per event: mean/std over the
    * entity's events in the preceding horizon (inclusive current, second
    * resolution, exact decimal moments), and a flag for values more than
    * `z` standard deviations above the window mean. Events with fewer
    * than `minN` window peers never flag (a 2-event "window" has no
    * meaningful variance). Output: (idCol, n, roll_mean, roll_std,
    * is_anomaly).
    *
    * Same single-exchange RANGE-frame shape as [[rollingAgg]]; both
    * moments accumulate in DECIMAL inside one window pass, so the flag is
    * deterministic under any partitioning — an alert that flips with the
    * executor count is worse than no alert.
    */
  def rollingAnomaly(
      events: DataFrame, userCol: String, tsCol: String, valueCol: String,
      idCol: String, horizonSec: Long, z: Double, minN: Int): DataFrame = {
    require(horizonSec > 0, "rollingAnomaly needs a positive horizon")
    val sec = unix_timestamp(date_trunc("second", col(tsCol)))
    val w = Window.partitionBy(col(userCol)).orderBy(col("_sec"))
      .rangeBetween(-(horizonSec - 1), 0)
    val base = events.select(
      col(idCol), col(userCol), sec.as("_sec"),
      round(col(valueCol), 6).as("_v6"),
      round(col(valueCol), 6).cast("decimal(18,6)").as("_vd"))
    val stats = base.select(
      col(idCol), col("_v6"),
      count(lit(1)).over(w).as("n"),
      sum(col("_vd")).over(w).cast("double").as("_s1"),
      sum(col("_vd") * col("_vd")).over(w).cast("double").as("_s2"))
    val mean = col("_s1") / col("n")
    val std = sqrt(greatest(col("_s2") / col("n") - mean * mean, lit(0.0)))
    stats.select(
      col(idCol), col("n"),
      round(mean, 6).as("roll_mean"),
      round(std, 6).as("roll_std"),
      (col("n") >= minN && col("_v6") > mean + lit(z) * std).as("is_anomaly"))
  }

  /** DuckDB mirror of [[rollingAnomaly]] — same horizon/z/minN, identical
    * arithmetic chain. */
  def rollingAnomalyOracleSql(
      table: String, userCol: String, tsCol: String, valueCol: String,
      idCol: String, horizonSec: Long, z: Double, minN: Int): String =
    s"""WITH e AS (
       |  SELECT $idCol, $userCol,
       |         CAST(epoch(date_trunc('second', $tsCol)) AS BIGINT) AS sec,
       |         round($valueCol, 6) AS v6,
       |         CAST(round($valueCol, 6) AS DECIMAL(18,6)) AS vd
       |  FROM $table
       |), w AS (
       |  SELECT $idCol, v6,
       |         COUNT(*) OVER win AS n,
       |         CAST(SUM(vd) OVER win AS DOUBLE) AS s1,
       |         CAST(SUM(vd * vd) OVER win AS DOUBLE) AS s2
       |  FROM e
       |  WINDOW win AS (PARTITION BY $userCol ORDER BY sec
       |                 RANGE BETWEEN ${horizonSec - 1} PRECEDING AND CURRENT ROW)
       |)
       |SELECT $idCol, n,
       |       round(s1 / n, 6) AS roll_mean,
       |       round(sqrt(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0.0)), 6) AS roll_std,
       |       (n >= $minN AND v6 > s1 / n + $z * sqrt(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0.0))) AS is_anomaly
       |FROM w""".stripMargin

  /** Dense daily panel per entity: one row per (entity, day) from the
    * entity's first to last active day; inactive days carry n_events = 0
    * and the most recent prior day's value sum (forward fill). Output:
    * (userCol, day, n_events, filled_sum).
    *
    * The per-day aggregate runs FIRST, so the grid/join/fill all operate
    * on |entities × days| rows, never |events|; bounds derive from the
    * aggregated frame (no second scan of the input).
    */
  def gapFillDaily(
      events: DataFrame, userCol: String, tsCol: String, valueCol: String): DataFrame = {
    val daily = events
      .select(col(userCol).as("_u"), to_date(col(tsCol)).as("day"),
        round(col(valueCol), 6).cast("decimal(18,6)").as("_v"))
      .groupBy("_u", "day")
      .agg(count(lit(1)).as("n_events"), sum("_v").as("_dsum"))
    val grid = daily
      .groupBy("_u").agg(min("day").as("_d0"), max("day").as("_d1"))
      .select(col("_u"), explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val w = Window.partitionBy("_u").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(daily, Seq("_u", "day"), "left")
      .select(col("_u").as(userCol), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("_dsum"), ignoreNulls = true).over(w).cast("double").as("filled_sum"))
  }

  /** DuckDB mirror of [[gapFillDaily]]. */
  def gapFillDailyOracleSql(
      table: String, userCol: String, tsCol: String, valueCol: String): String =
    s"""WITH daily AS (
       |  SELECT $userCol AS u, CAST($tsCol AS DATE) AS day, count(*) AS n_events,
       |         SUM(CAST(round($valueCol, 6) AS DECIMAL(18,6))) AS dsum
       |  FROM $table GROUP BY 1, 2
       |), bounds AS (
       |  SELECT u, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
       |), grid AS (
       |  SELECT u, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM bounds
       |)
       |SELECT g.u AS $userCol, g.day,
       |       COALESCE(d.n_events, 0) AS n_events,
       |       CAST(last_value(d.dsum IGNORE NULLS) OVER (PARTITION BY g.u ORDER BY g.day) AS DOUBLE) AS filled_sum
       |FROM grid g LEFT JOIN daily d ON g.u = d.u AND g.day = d.day""".stripMargin
}
