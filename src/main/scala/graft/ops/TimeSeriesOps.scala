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

  /** OHLC downsampling: per (key, hour) the opening/closing values under
    * an explicit (ts, id) total order plus high/low/count — the
    * candlestick/telemetry resample. ONE aggregation pass, no window:
    * open/close ride `min_by`/`max_by` with a struct ordering key, so the
    * plan is a plain partial-aggregated hash agg (a window form would sort
    * every (key, hour) partition). All outputs are picked or min/max'd
    * raw values — exact, no accumulation-order concern.
    */
  def ohlc(events: DataFrame, keyCol: String, tsCol: String, valueCol: String,
           idCol: String): DataFrame = {
    val ts2 = date_trunc("second", col(tsCol))
    events
      .select(col(keyCol), ts2.as("_ts"), col(valueCol).as("_v"), col(idCol).as("_id"))
      .groupBy(col(keyCol), date_trunc("hour", col("_ts")).as("hour"))
      .agg(
        min_by(col("_v"), struct(col("_ts"), col("_id"))).as("open"),
        max_by(col("_v"), struct(col("_ts"), col("_id"))).as("close"),
        max(col("_v")).as("high"),
        min(col("_v")).as("low"),
        count(lit(1)).as("n"))
  }

  /** DuckDB mirror of [[ohlc]] — arg_min/arg_max take no struct ordering
    * there, so the oracle picks open/close via first/last row-number
    * windows under the same (ts, id) order. */
  def ohlcOracleSql(table: String, keyCol: String, tsCol: String,
                    valueCol: String, idCol: String): String =
    s"""WITH e AS (
       |  SELECT $keyCol AS k, date_trunc('hour', date_trunc('second', $tsCol)) AS hour,
       |         date_trunc('second', $tsCol) AS ts2, $valueCol AS v, $idCol AS id
       |  FROM $table
       |), r AS (
       |  SELECT k, hour, v,
       |         row_number() OVER (PARTITION BY k, hour ORDER BY ts2, id) AS rn_a,
       |         row_number() OVER (PARTITION BY k, hour ORDER BY ts2 DESC, id DESC) AS rn_d
       |  FROM e
       |)
       |SELECT k AS $keyCol, hour,
       |       max(CASE WHEN rn_a = 1 THEN v END) AS open,
       |       max(CASE WHEN rn_d = 1 THEN v END) AS close,
       |       max(v) AS high, min(v) AS low, CAST(count(*) AS BIGINT) AS n
       |FROM r GROUP BY 1, 2""".stripMargin

  /** Debounce: keep only the FIRST event of each gap-based session —
    * the event-stream throttling op (alert suppression, click dedup by
    * time proximity). Sessionization and first-pick share one (user)
    * partitioning: the session-id cumsum and the keeper row_number run
    * over the SAME exchange, so debouncing costs exactly the sessionize
    * shuffle. Returns the kept rows with the input's schema unchanged.
    */
  def debounce(events: DataFrame, userCol: String, tsCol: String,
               idCol: String, gapSec: Long): DataFrame = {
    val inCols = events.columns.toSeq
    val working = Seq("_ts2", "_prev", "_new", "_sess", "_rn")
    require(!inCols.exists(working.contains),
      s"input columns collide with debounce working columns ${working.mkString(",")}")
    val w = Window.partitionBy(userCol).orderBy(col("_ts2"), col(idCol))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_ts2", date_trunc("second", col(tsCol)))
      .withColumn("_prev", lag(col("_ts2"), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull ||
          (unix_timestamp(col("_ts2")) - unix_timestamp(col("_prev"))) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("_sess", sum(col("_new")).over(wCum))
      .withColumn("_rn",
        row_number().over(
          Window.partitionBy(col(userCol), col("_sess")).orderBy(col("_ts2"), col(idCol))))
      .filter(col("_rn") === 1)
      .select(inCols.map(col): _*)
  }

  /** Exponential-decay activity counts per group: each event contributes
    * `0.5^bucket` where `bucket = clamp(floor(age_days / halflife), 0,
    * maxBuckets)` — the recency-weighted engagement feature. EXACT in
    * doubles by construction: every weight is a power of two ≥
    * 2^-maxBuckets, so partial sums are integer multiples of
    * 2^-maxBuckets and stay exact (order-independent, engine-portable)
    * until they exceed 2^(53-maxBuckets) — with the default 20 buckets,
    * ~8.6e9 weight units, far past any per-group event count here. One
    * hash aggregation; no window, no UDF.
    */
  def decayedCounts(df: DataFrame, groupCol: String, dateCol: String,
                    refDate: String, halflifeDays: Int = 30,
                    maxBuckets: Int = 20): DataFrame = {
    require(maxBuckets <= 40, "maxBuckets beyond 40 loses double exactness headroom")
    val bucket = least(
      greatest(floor(datediff(lit(refDate).cast("date"), col(dateCol)) /
        lit(halflifeDays.toDouble)), lit(0.0)),
      lit(maxBuckets.toDouble))
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(pow(lit(0.5), bucket)).as("decayed_cnt"))
  }

  /** DuckDB mirror of [[decayedCounts]]. */
  def decayedCountsOracleSql(table: String, groupCol: String, dateCol: String,
                             refDate: String, halflifeDays: Int = 30,
                             maxBuckets: Int = 20): String =
    s"""SELECT $groupCol, CAST(count(*) AS BIGINT) AS n_rows,
       |       SUM(power(0.5, least(greatest(floor(date_diff('day', $dateCol, DATE '$refDate') / CAST($halflifeDays AS DOUBLE)), 0.0), ${maxBuckets.toDouble}))) AS decayed_cnt
       |FROM $table GROUP BY 1""".stripMargin

  /** Cumulative distinct entities per day — the "unique users so far"
    * growth curve. A naive running COUNT(DISTINCT) drags every row into
    * an ever-growing window state; instead each entity is counted ONCE,
    * on the day of its FIRST event (one hash-agg over the data), and the
    * running sum of those first appearances over the |days|-sized daily
    * table IS the cumulative distinct count. Output:
    * (day, new_users, cum_users).
    *
    * Scale shape: the only data-sized pass is the min-day hash-agg
    * (map-side combined on the entity key). The unpartitioned running-sum
    * window runs over post-aggregation |days| rows — bounded by the
    * calendar, not the data.
    */
  def cumulativeUniques(events: DataFrame, userCol: String,
                        tsCol: String): DataFrame = {
    val firstDay = events
      .select(col(userCol).as("_u"), to_date(col(tsCol)).as("_day"))
      .groupBy("_u").agg(min("_day").as("day"))
    val perDay = firstDay.groupBy("day").agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay.select(col("day"), col("new_users"),
      sum("new_users").over(w).as("cum_users"))
  }

  /** DuckDB mirror of [[cumulativeUniques]]. */
  def cumulativeUniquesOracleSql(table: String, userCol: String,
                                 tsCol: String): String =
    s"""WITH fd AS (
       |  SELECT $userCol AS u, MIN(CAST($tsCol AS DATE)) AS day
       |  FROM $table GROUP BY 1
       |), pd AS (SELECT day, count(*) AS new_users FROM fd GROUP BY 1)
       |SELECT day, new_users,
       |       CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
       |            AS BIGINT) AS cum_users
       |FROM pd""".stripMargin

  /** Rolling k-day active-user counts per day (WAU/MAU shape): the count
    * of distinct entities with any event in `[day − k + 1, day]`, for
    * every day any window covers. A sliding COUNT(DISTINCT) window over
    * raw events is unbounded state; instead the data collapses to the
    * distinct (entity, day) activity frame first, each active day is
    * exploded onto the k calendar days it is visible from (executor-side
    * `sequence`, k small), and one distinct-count per day finishes the
    * job. Days after the last observed activity show the window's
    * tail-off — that IS the metric's value there. Output: (day, wau).
    *
    * Scale shape: the heavy pass is the (entity, day) distinct — one
    * hash-agg with map-side combine. The exploded frame is
    * |entity-days|·k, still far below the event count whenever entities
    * repeat within a day (the regime where WAU matters).
    */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
                         windowDays: Int = 7): DataFrame = {
    require(windowDays > 0, "windowDays must be positive")
    val active = events
      .select(col(userCol), to_date(col(tsCol)).as("_day")).distinct()
    active
      .select(col(userCol),
        explode(sequence(col("_day"), date_add(col("_day"), windowDays - 1)))
          .as("day"))
      .groupBy("day")
      .agg(countDistinct(col(userCol)).as("wau"))
  }

  /** DuckDB mirror of [[rollingActiveUsers]]. */
  def rollingActiveUsersOracleSql(table: String, userCol: String,
                                  tsCol: String, windowDays: Int = 7): String =
    s"""WITH active AS (
       |  SELECT DISTINCT $userCol AS u, CAST($tsCol AS DATE) AS day FROM $table
       |), vis AS (
       |  SELECT u, CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
       |           CAST(day AS TIMESTAMP) + INTERVAL ${windowDays - 1} DAY,
       |           INTERVAL 1 DAY)) AS DATE) AS day2
       |  FROM active
       |)
       |SELECT day2 AS day, count(DISTINCT u) AS wau FROM vis GROUP BY 1""".stripMargin

  /** Per-entity lag features over the entity's OBSERVED daily activity:
    * daily sum/count per (entity, day), plus the daily sum from the k-th
    * previous observed day for each requested lag — the autoregressive
    * feature block of a per-entity forecasting table. Lags skip calendar
    * gaps (previous OBSERVED day); compose with [[gapFillDaily]] first
    * when calendar-aligned lags are wanted. Output:
    * (userCol, day, day_sum, n_events, lag<k>_sum…).
    *
    * Scale shape: one hash-agg to the |entity×days| daily table, then
    * ALL lags from a single window pass over that table (one exchange on
    * the entity, each partition days-sized). Daily sums accumulate in
    * DECIMAL, so the emitted doubles are partition- and engine-exact.
    */
  def lagFeatures(events: DataFrame, userCol: String, tsCol: String,
                  valueCol: String, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ > 0), "lags must be positive")
    val daily = events
      .select(col(userCol).as("_u"), to_date(col(tsCol)).as("day"),
        round(col(valueCol), 6).cast("decimal(18,6)").as("_v"))
      .groupBy("_u", "day")
      .agg(sum("_v").as("_dsum"), count(lit(1)).as("n_events"))
    val w = Window.partitionBy("_u").orderBy("day")
    val lagCols = lags.map(k =>
      lag(col("_dsum"), k).over(w).cast("double").as(s"lag${k}_sum"))
    daily.select(
      Seq(col("_u").as(userCol), col("day"),
        col("_dsum").cast("double").as("day_sum"), col("n_events")) ++ lagCols: _*)
  }

  /** DuckDB mirror of [[lagFeatures]]. */
  def lagFeaturesOracleSql(table: String, userCol: String, tsCol: String,
                           valueCol: String, lags: Seq[Int]): String = {
    val lagSelects = lags.map(k =>
      s"CAST(lag(dsum, $k) OVER (PARTITION BY u ORDER BY day) AS DOUBLE) AS lag${k}_sum")
      .mkString(",\n       |       ")
    s"""WITH daily AS (
       |  SELECT $userCol AS u, CAST($tsCol AS DATE) AS day,
       |         SUM(CAST(round($valueCol, 6) AS DECIMAL(18,6))) AS dsum,
       |         count(*) AS n_events
       |  FROM $table GROUP BY 1, 2
       |)
       |SELECT u AS $userCol, day, CAST(dsum AS DOUBLE) AS day_sum, n_events,
       |       $lagSelects
       |FROM daily""".stripMargin
  }

  /** Gaps-and-islands: maximal runs of CONSECUTIVE active days per entity
    * ("activity streaks" — retention features, engagement scoring). The
    * dense-rank-difference trick: distinct (user, day), one per-user
    * window ordered by day, anchor = day − row_number — constant exactly
    * within a consecutive run — then one aggregate per (user, anchor).
    * Two exchanges, BOTH on the user key (AQE coalesces them into one
    * partitioning); no self-join, no gap rows materialized — the gaps are
    * implied by anchor changes, never stored. Survives 100 TB: state per
    * task is one window row, and the distinct pre-aggregates map-side.
    */
  def activityStreaks(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val days = events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("d"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    days
      .withColumn("_anchor", date_sub(col("d"), row_number().over(w)))
      .groupBy(col("user_id"), col("_anchor"))
      .agg(min("d").as("streak_start"), max("d").as("streak_end"),
        count(lit(1)).as("n_days"))
      .select("user_id", "streak_start", "streak_end", "n_days")
  }

  /** DuckDB mirror of [[activityStreaks]]. */
  def activityStreaksOracleSql(table: String, userCol: String, tsCol: String): String =
    s"""WITH days AS (
       |  SELECT DISTINCT $userCol AS user_id, CAST($tsCol AS DATE) AS d FROM $table
       |), anch AS (
       |  SELECT user_id, d,
       |         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER) AS anchor
       |  FROM days
       |)
       |SELECT user_id, min(d) AS streak_start, max(d) AS streak_end,
       |       count(*) AS n_days
       |FROM anch GROUP BY user_id, anchor""".stripMargin

  /** Per-key lag-k autocorrelation of the daily value sums — the
    * seasonality probe (does yesterday predict today?) run before fitting
    * any temporal model. Lags are ROW lags over the key's observed days
    * (both engines see the identical series, so the oracle matches even
    * across calendar gaps). Daily sums accumulate in DECIMAL (exact,
    * order-independent); the Pearson corr runs on doubles and is rounded
    * to 6 dp — the repo-wide convention for merge-order-jitter-proof
    * floating aggregates. One exchange for the daily rollup, one for the
    * per-key window + corr (same key ⇒ same partitioning, reused).
    */
  def autocorr(events: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 10, s"maxLag in [1,10], got $maxLag")
    val daily = events
      .groupBy(col(keyCol).as("_k"), to_date(col(tsCol)).as("d"))
      .agg(sum(round(col(valueCol), 6).cast("decimal(18,6)")).cast("double").as("v"))
    val w = Window.partitionBy("_k").orderBy("d")
    val lagged = (1 to maxLag).foldLeft(daily)((df, l) =>
      df.withColumn(s"_vl$l", lag(col("v"), l).over(w)))
    val aggs = count(lit(1)).as("n_days") +:
      (1 to maxLag).map(l => round(corr(col("v"), col(s"_vl$l")), 6).as(s"acf_$l"))
    lagged.groupBy(col("_k").as(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** CUSUM change-point scores per key — the sequential-detection
    * statistic `s_t = max(0, s_{t−1} + (x_t − μ))` over the key's daily
    * value sums, which flags a SUSTAINED shift above the series mean
    * (a single spike decays; a level change accumulates).
    *
    * The recursion looks sequential but is exactly a prefix scan:
    * `s_t = R_t − min(0, min_{j≤t} R_j)` with `R` the running sum of
    * residuals — so it runs as ONE cumulative-sum window plus ONE
    * running-min window over the same (key, day) sort: two window
    * passes sharing a single exchange, no iteration, no driver loop.
    *
    * Exactness: daily sums land in integer CENTS, and the residual is
    * scaled by the key's day count (`r_t = n·x_t − S`, all BIGINT) so
    * no mean division ever happens — both engines produce identical
    * integers. `cusum_scaled = n · cusum` in cent units; consumers
    * divide by n (or compare against n-scaled thresholds).
    */
  def cusum(events: DataFrame, keyCol: String, tsCol: String,
            valueCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol).as("_k"), to_date(col(tsCol)).as("d"))
      .agg(sum((round(col(valueCol), 2).cast("decimal(18,2)") * 100).cast("long")).as("v_cents"))
    val wAll = Window.partitionBy("_k")
    val wRun = Window.partitionBy("_k").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_s", sum("v_cents").over(wAll))
      .withColumn("_r", sum(col("_n") * col("v_cents") - col("_s")).over(wRun))
      .select(col("_k").as(keyCol), col("d"), col("v_cents"), col("_n").as("n_days"),
        (col("_r") - least(lit(0L), min("_r").over(wRun))).as("cusum_scaled"))
  }

  /** DuckDB mirror of [[cusum]]. */
  def cusumOracleSql(table: String, keyCol: String, tsCol: String,
                     valueCol: String): String =
    s"""WITH daily AS (
       |  SELECT $keyCol AS k, CAST($tsCol AS DATE) AS d,
       |         CAST(SUM(CAST(CAST(round($valueCol, 2) AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v_cents
       |  FROM $table GROUP BY 1, 2
       |), m AS (
       |  SELECT k, d, v_cents,
       |         CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
       |         CAST(SUM(v_cents) OVER (PARTITION BY k) AS BIGINT) AS s
       |  FROM daily
       |), r AS (
       |  SELECT k, d, v_cents, n,
       |         CAST(SUM(n * v_cents - s) OVER (
       |           PARTITION BY k ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rr
       |  FROM m
       |)
       |SELECT k AS $keyCol, d, v_cents, n AS n_days,
       |       rr - LEAST(CAST(0 AS BIGINT), CAST(MIN(rr) OVER (
       |         PARTITION BY k ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)) AS cusum_scaled
       |FROM r""".stripMargin

  /** DuckDB mirror of [[autocorr]]. */
  def autocorrOracleSql(table: String, keyCol: String, tsCol: String,
                        valueCol: String, maxLag: Int = 3): String = {
    val lagSelects = (1 to maxLag)
      .map(l => s"lag(v, $l) OVER (PARTITION BY k ORDER BY d) AS vl$l")
      .mkString(",\n       |         ")
    val corrSelects = (1 to maxLag)
      .map(l => s"round(corr(v, vl$l), 6) AS acf_$l")
      .mkString(",\n       |       ")
    s"""WITH daily AS (
       |  SELECT $keyCol AS k, CAST($tsCol AS DATE) AS d,
       |         CAST(SUM(CAST(round($valueCol, 6) AS DECIMAL(18,6))) AS DOUBLE) AS v
       |  FROM $table GROUP BY 1, 2
       |), lg AS (
       |  SELECT k, v,
       |         $lagSelects
       |  FROM daily
       |)
       |SELECT k AS $keyCol, count(*) AS n_days,
       |       $corrSelects
       |FROM lg GROUP BY 1""".stripMargin
  }

  /** Day-of-week seasonal indices of a daily count series — the
    * decomposition step before any deseasonalized anomaly check or
    * forecast: `idx(dow) = mean(count | dow) / mean(count)`. Pure
    * rational arithmetic over integer day counts (exact until the one
    * rounded division), so the profile is engine-portable.
    *
    * Emits one row per observed day-of-week
    * `(dow, n_days, sum_cnt, seasonal_idx)` with Spark's `dayofweek`
    * numbering (1 = Sunday).
    *
    * Scale shape: the raw data collapses to the day grain in ONE hash
    * aggregation; everything after runs on ≤ (distinct days) rows, and
    * the final index table is 7 rows. No second pass over events.
    */
  def seasonalDow(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events
      .groupBy(to_date(col(tsCol)).as("_day"))
      .agg(count(lit(1)).as("_cnt"))
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    daily
      .select(dayofweek(col("_day")).as("dow"), col("_cnt"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n_days"), sum("_cnt").as("sum_cnt"))
      .select(col("dow"), col("n_days"), col("sum_cnt"),
        round((col("sum_cnt").cast("double") / col("n_days").cast("double")) /
          (sum("sum_cnt").over(wAll).cast("double") /
            sum("n_days").over(wAll).cast("double")), 6).as("seasonal_idx"))
  }

  /** DuckDB mirror of [[seasonalDow]] (DuckDB's `dayofweek` is 0-based
    * Sunday, hence the `+ 1`).
    */
  def seasonalDowOracleSql(table: String, tsCol: String): String =
    s"""WITH daily AS (
       |  SELECT CAST($tsCol AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
       |  FROM $table GROUP BY 1
       |), g AS (
       |  SELECT CAST(dayofweek(day) + 1 AS INTEGER) AS dow,
       |         CAST(count(*) AS BIGINT) AS n_days, CAST(SUM(cnt) AS BIGINT) AS sum_cnt
       |  FROM daily GROUP BY 1
       |), tot AS (
       |  SELECT CAST(SUM(sum_cnt) AS BIGINT) AS ts, CAST(SUM(n_days) AS BIGINT) AS td FROM g
       |)
       |SELECT dow, n_days, sum_cnt,
       |       round((CAST(sum_cnt AS DOUBLE) / CAST(n_days AS DOUBLE)) /
       |             (CAST(ts AS DOUBLE) / CAST(td AS DOUBLE)), 6) AS seasonal_idx
       |FROM g, tot""".stripMargin

  /** Exponentially-weighted moving average over each key's DAILY count
    * series at α = 1/2, in the dyadic-exact form: with α = 1/2 every
    * fold step is `acc·0.5 + x·0.5` — halving an IEEE double is EXACT
    * and the one addition per step is correctly rounded, so a
    * left-to-right fold over the day-ascending series is bit-identical
    * on every engine (the sqrt-temperature-mix argument applied to a
    * recurrence; an arbitrary α carries no such guarantee because
    * (1−α)^k accumulates rounding). Days with no events are skipped,
    * not zero-filled (documented; both engines agree by construction).
    *
    * Scale shape: ONE (key, day) hash-agg over the events (map-side
    * combine), then the fold runs over each key's own bounded daily
    * series (|days| elements) inside a per-key aggregate — no window
    * over the event-sized frame, no driver loop.
    */
  def ewmaDaily(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
    daily
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col("day"), col("x")))).as("s"),
        max(col("day")).as("last_day"))
      .select(col(keyCol),
        size(col("s")).cast("long").as("n_days"),
        col("last_day"),
        aggregate(
          slice(transform(col("s"), e => e.getField("x")), lit(2), size(col("s")) - 1),
          element_at(transform(col("s"), e => e.getField("x")), 1),
          (acc, v) => acc * lit(0.5) + v * lit(0.5)).as("ewma"))
  }

  /** DuckDB mirror of [[ewmaDaily]] — `list_reduce` seeds with the first
    * element and folds left, exactly the Spark `aggregate` shape.
    */
  def ewmaDailyOracleSql(table: String, keyCol: String, tsCol: String): String =
    s"""WITH daily AS (
       |  SELECT $keyCol AS k, CAST(date_trunc('day', $tsCol) AS DATE) AS day,
       |         CAST(count(*) AS DOUBLE) AS x
       |  FROM $table GROUP BY 1, 2
       |), ser AS (
       |  SELECT k, list(x ORDER BY day) AS vs, max(day) AS last_day
       |  FROM daily GROUP BY 1
       |)
       |SELECT k AS $keyCol, CAST(len(vs) AS BIGINT) AS n_days, last_day,
       |       list_reduce(vs, (acc, v) -> acc * 0.5 + v * 0.5) AS ewma
       |FROM ser""".stripMargin

  /** Holt's linear-trend (double exponential) smoothing over each key's
    * DAILY count series at α = β = 1/2 — [[ewmaDaily]]'s dyadic-exact
    * argument applied to the TWO-state recurrence:
    *
    *   level lₜ = yₜ·0.5 + (lₜ₋₁ + bₜ₋₁)·0.5
    *   trend bₜ = (lₜ − lₜ₋₁)·0.5 + bₜ₋₁·0.5
    *
    * Every step is {halve (exact), one correctly-rounded add/subtract} in
    * a pinned left-to-right order, so the fold is bit-identical on every
    * IEEE 754 engine. Standard init l₁ = y₁, b₁ = y₂ − y₁ (Hyndman &
    * Athanasopoulos, FPP §8.2); keys with a single day drop out (no trend
    * axis). The h-step forecast ŷ(h) = l + b·h is reported for h = 1, 7.
    *
    * Scale shape: identical to [[ewmaDaily]] — one (key, day) hash-agg
    * with map-side combine, then a bounded per-key fold; no event-sized
    * window, no driver loop.
    */
  def holtDaily(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
    val folded = daily
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col("day"), col("x")))).as("s"),
        max(col("day")).as("last_day"))
      .filter(size(col("s")) >= 2)
      .select(col(keyCol),
        size(col("s")).cast("long").as("n_days"),
        col("last_day"),
        aggregate(
          slice(transform(col("s"), e => e.getField("x")), lit(3), size(col("s")) - 2),
          struct(
            element_at(transform(col("s"), e => e.getField("x")), 1).as("l"),
            (element_at(transform(col("s"), e => e.getField("x")), 2) -
              element_at(transform(col("s"), e => e.getField("x")), 1)).as("b")),
          (acc, y) => {
            val lNew = y * lit(0.5) + (acc.getField("l") + acc.getField("b")) * lit(0.5)
            struct(
              lNew.as("l"),
              ((lNew - acc.getField("l")) * lit(0.5) +
                acc.getField("b") * lit(0.5)).as("b"))
          }).as("st"))
    folded.select(
      col(keyCol), col("n_days"), col("last_day"),
      col("st.l").as("level"), col("st.b").as("trend"),
      (col("st.l") + col("st.b")).as("fc_1"),
      (col("st.l") + col("st.b") * lit(7.0)).as("fc_7"))
  }

  /** DuckDB mirror of [[holtDaily]] — the two-state recurrence runs as a
    * RECURSIVE CTE stepping one day at a time with the identical pinned
    * op order. (NOT `list_reduce` with a struct accumulator: DuckDB
    * 1.0.0 evaluates the struct's later fields against the already-
    * overwritten earlier fields — an in-place state-update bug that
    * corrupts any two-state fold.)
    */
  def holtDailyOracleSql(table: String, keyCol: String, tsCol: String): String =
    s"""WITH RECURSIVE daily AS (
       |  SELECT $keyCol AS k, CAST(date_trunc('day', $tsCol) AS DATE) AS day,
       |         CAST(count(*) AS DOUBLE) AS x
       |  FROM $table GROUP BY 1, 2
       |), ser AS (
       |  SELECT k, list(x ORDER BY day) AS vs, max(day) AS last_day,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM daily GROUP BY 1 HAVING count(*) >= 2
       |), it AS (
       |  SELECT k, 2 AS i, vs[1] AS l, vs[2] - vs[1] AS b FROM ser
       |  UNION ALL
       |  SELECT it.k, i + 1,
       |         vs[i + 1] * 0.5 + (l + b) * 0.5,
       |         (vs[i + 1] * 0.5 + (l + b) * 0.5 - l) * 0.5 + b * 0.5
       |  FROM it JOIN ser ON it.k = ser.k WHERE i < n
       |)
       |SELECT it.k AS $keyCol, ser.n AS n_days, ser.last_day,
       |       it.l AS level, it.b AS trend,
       |       it.l + it.b AS fc_1, it.l + it.b * 7.0 AS fc_7
       |FROM it JOIN ser ON it.k = ser.k WHERE it.i = ser.n""".stripMargin
}
