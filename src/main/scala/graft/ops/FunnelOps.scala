package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a (user, type, time) event stream —
  * ordered funnels, cohort retention, and transition frequencies. The
  * reference's cohort query (Hap880_Final_Project.py:19-87) is a 2-stage
  * "admission followed by readmission" funnel; these operators generalize
  * it to arbitrary stage chains and to the retention-matrix view a
  * product/training-data pipeline needs.
  *
  * Scale shape: every operator aggregates per entity BEFORE joining, so
  * join inputs are |users|-sized, not |events|-sized; the stage chain is
  * k−1 equi-joins on the entity key, each between two already-aggregated
  * frames that reuse the same hash partitioning; nothing funnels through
  * the driver. Timestamps are second-truncated up front — sub-second
  * precision differs across storage engines (ns parquet vs µs session),
  * and funnel semantics at 100 TB should not hinge on it.
  */
object FunnelOps {

  private def ts2(tsCol: String): Column = date_trunc("second", col(tsCol))

  /** Strictly-ordered funnel: stage k counts entities whose earliest
    * stage-k event is strictly AFTER their earliest qualifying stage-k−1
    * event — and, when `maxGapSec` is set, no more than that many seconds
    * after it (the "converted within 7 days" product-analytics form).
    * Returns one row per stage: (stage_idx, stage, n_users).
    *
    * Each stage filters the event scan to ONE type (predicate pushdown
    * reaches the parquet scan), aggregates min-time per entity (map-side
    * partial combine), then equi-joins the previous stage's per-entity
    * frame — so the chain's cost is k pruned scans + k small joins.
    */
  def funnel(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      stages: Seq[String], maxGapSec: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(maxGapSec.forall(_ > 0), "maxGapSec must be positive when set")
    val spark = events.sparkSession
    import spark.implicits._

    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("_u"))
      .agg(min(ts2(tsCol)).as("_t"))
    val perStage: Seq[DataFrame] = stages.tail.scanLeft(first) { (prev, stage) =>
      val gapOk = maxGapSec
        .map(g => col("_ts") <= col("_pt") + expr(s"INTERVAL $g SECONDS"))
        .getOrElse(lit(true))
      events.filter(col(typeCol) === stage)
        .select(col(userCol).as("_u"), ts2(tsCol).as("_ts"))
        .join(prev.select(col("_u"), col("_t").as("_pt")), Seq("_u"))
        .filter(col("_ts") > col("_pt") && gapOk)
        .groupBy("_u").agg(min(col("_ts")).as("_t"))
    }
    val counts = perStage.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage_idx"), lit(stages(i)).as("stage"), col("n_users"))
    }
    counts.reduce(_.unionByName(_))
  }

  /** DuckDB mirror of [[funnel]] — generated from the SAME stage list and
    * gap so the two can't drift. */
  def funnelOracleSql(table: String, userCol: String, typeCol: String,
                      tsCol: String, stages: Seq[String],
                      maxGapSec: Option[Long] = None): String = {
    val ctes = stages.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"s1 AS (SELECT $userCol AS u, MIN(date_trunc('second', $tsCol)) AS t FROM $table WHERE $typeCol = '$st' GROUP BY 1)"
      else {
        val gap = maxGapSec
          .map(g => s" AND date_trunc('second', e.$tsCol) <= s$i.t + INTERVAL $g SECONDS")
          .getOrElse("")
        s"s${i + 1} AS (SELECT e.$userCol AS u, MIN(date_trunc('second', e.$tsCol)) AS t " +
          s"FROM $table e JOIN s$i ON e.$userCol = s$i.u " +
          s"WHERE e.$typeCol = '$st' AND date_trunc('second', e.$tsCol) > s$i.t$gap GROUP BY 1)"
      }
    }
    val selects = stages.zipWithIndex.map { case (st, i) =>
      s"SELECT ${i + 1} AS stage_idx, '$st' AS stage, count(*) AS n_users FROM s${i + 1}"
    }
    s"WITH ${ctes.mkString(",\n")}\n${selects.mkString("\nUNION ALL\n")}"
  }

  /** Cohort retention matrix: entities are cohorted by their FIRST event
    * date; cell (cohort_date, week_offset) counts distinct entities with
    * any event in that week-offset from their cohort date. Output:
    * (cohort_date, week_offset, n_users).
    *
    * One aggregation to the per-entity cohort frame, one join back onto
    * the (date-projected) event scan, one distinct-count aggregation —
    * the join key is the entity, so cohorting reuses the aggregation's
    * partitioning.
    */
  def retention(
      events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstDay = events
      .groupBy(col(userCol).as("_u"))
      .agg(min(to_date(col(tsCol))).as("cohort_date"))
    events
      .select(col(userCol).as("_u"), to_date(col(tsCol)).as("_d"))
      .join(firstDay, Seq("_u"))
      .select(col("_u"), col("cohort_date"),
        floor(datediff(col("_d"), col("cohort_date")) / lit(7)).cast("int").as("week_offset"))
      .groupBy("cohort_date", "week_offset")
      .agg(countDistinct(col("_u")).as("n_users"))
  }

  def retentionOracleSql(table: String, userCol: String, tsCol: String): String =
    s"""WITH f AS (
       |  SELECT $userCol AS u, MIN(CAST($tsCol AS DATE)) AS cohort_date FROM $table GROUP BY 1
       |)
       |SELECT cohort_date,
       |       CAST(FLOOR(date_diff('day', cohort_date, CAST($tsCol AS DATE)) / 7.0) AS INTEGER) AS week_offset,
       |       count(DISTINCT e.$userCol) AS n_users
       |FROM $table e JOIN f ON e.$userCol = f.u
       |GROUP BY 1, 2""".stripMargin

  /** Event-type transition frequencies: per entity, order events by
    * (second-truncated time, event id) and count each consecutive
    * (from_type → to_type) pair. The Markov-chain view of user behavior;
    * output (from_type, to_type, cnt).
    *
    * One window pass (single hash partition exchange on the entity) +
    * one small aggregation — the output is |types|² rows regardless of
    * input size.
    */
  def transitions(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col("_t"), col(idCol))
    events
      .select(col(userCol), col(typeCol).as("from_type"), ts2(tsCol).as("_t"), col(idCol))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("cnt"))
  }

  def transitionsOracleSql(table: String, userCol: String, typeCol: String,
                           tsCol: String, idCol: String): String =
    s"""WITH x AS (
       |  SELECT $typeCol AS from_type,
       |         LEAD($typeCol) OVER (PARTITION BY $userCol
       |           ORDER BY date_trunc('second', $tsCol) NULLS FIRST, $idCol) AS to_type
       |  FROM $table
       |)
       |SELECT from_type, to_type, count(*) AS cnt
       |FROM x WHERE to_type IS NOT NULL GROUP BY 1, 2""".stripMargin

  /** Last-touch attribution: each conversion event is credited to the
    * entity's most recent STRICTLY PRECEDING touch event (under the
    * deterministic (second-truncated ts, id) total order), provided that
    * touch happened within `lookbackSec`; conversions with no qualifying
    * touch fall into the `"(none)"` bucket. Output:
    * (channel, n_conv, n_users) — the marketing-attribution shape, and
    * equally the "which upstream signal preceded this outcome" query of
    * any event pipeline.
    *
    * Scale shape: ONE window pass over one exchange on the entity — the
    * two ignore-nulls `last` calls share the frame, and because they gate
    * on the same predicate they always read the same touch row. No
    * self-join of conversions against touches (the naive form is a
    * range-join the optimizer turns into a per-row probe).
    */
  def lastTouchAttribution(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      idCol: String, touchTypes: Seq[String], convType: String,
      lookbackSec: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(lookbackSec > 0, "lookbackSec must be positive")
    val sec = unix_timestamp(ts2(tsCol))
    val isTouch = col(typeCol).isin(touchTypes: _*)
    val w = Window.partitionBy(col(userCol)).orderBy(col("_sec"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col(userCol), col(typeCol), col(idCol), sec.as("_sec"))
      .select(col(userCol), col(typeCol), col("_sec"),
        last(when(isTouch, col("_sec")), ignoreNulls = true).over(w).as("touch_sec"),
        last(when(isTouch, col(typeCol)), ignoreNulls = true).over(w).as("touch_type"))
      .filter(col(typeCol) === convType)
      .select(col(userCol),
        when(col("touch_sec").isNotNull &&
          col("touch_sec") >= col("_sec") - lit(lookbackSec), col("touch_type"))
          .otherwise(lit("(none)")).as("channel"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_conv"), countDistinct(col(userCol)).as("n_users"))
  }

  /** Touch→conversion latency per attributed channel — the "how long does
    * each channel take to convert" companion of [[lastTouchAttribution]]:
    * same ONE window pass finds each conversion's last preceding touch;
    * attributed conversions emit (channel, seconds) and collapse to per-
    * channel count, exact mean (integer-second sum over count), and exact
    * interpolated p50/p90 (the a10_quantiles parity contract).
    */
  def timeToConvert(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      idCol: String, touchTypes: Seq[String], convType: String,
      lookbackSec: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(lookbackSec > 0, "lookbackSec must be positive")
    val sec = unix_timestamp(ts2(tsCol))
    val isTouch = col(typeCol).isin(touchTypes: _*)
    val w = Window.partitionBy(col(userCol)).orderBy(col("_sec"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col(userCol), col(typeCol), col(idCol), sec.as("_sec"))
      .select(col(typeCol), col("_sec"),
        last(when(isTouch, col("_sec")), ignoreNulls = true).over(w).as("touch_sec"),
        last(when(isTouch, col(typeCol)), ignoreNulls = true).over(w).as("touch_type"))
      .filter(col(typeCol) === convType &&
        col("touch_sec").isNotNull &&
        col("touch_sec") >= col("_sec") - lit(lookbackSec))
      .select(col("touch_type").as("channel"), (col("_sec") - col("touch_sec")).as("lat"))
      .groupBy("channel")
      .agg(
        count(lit(1)).as("n_conv"),
        round(sum("lat").cast("double") / count(lit(1)), 6).as("mean_sec"),
        round(expr("percentile(lat, 0.5D)"), 6).as("p50_sec"),
        round(expr("percentile(lat, 0.9D)"), 6).as("p90_sec"))
  }

  /** LINEAR multi-touch attribution: each conversion splits one unit of
    * credit equally over ALL touches inside its lookback window (vs
    * [[lastTouchAttribution]]'s winner-takes-all). Unattributed
    * conversions (no touch in window) credit "(none)" in full.
    *
    * Credits are integer parts-per-million (`1e6 · n_channel ÷ k`,
    * truncating integer division) so the per-channel totals are exact
    * integer sums — order-independent, partition-invariant, and mirrored
    * exactly by the oracle; a double `1/k` sum would drift with
    * aggregation order.
    *
    * Scale shape: NO conversions×touches join — per-channel and total
    * in-window touch counts come from |channels|+1 RANGE-frame windowed
    * counts sharing ONE (user) exchange and sort; the credit stack is
    * executor-side (one Expand), then a |channels|-sized hash-agg.
    */
  def linearAttribution(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      touchTypes: Seq[String], convType: String, lookbackSec: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(lookbackSec > 0, "lookbackSec must be positive")
    val sec = unix_timestamp(ts2(tsCol))
    val isTouch = col(typeCol).isin(touchTypes: _*)
    // RANGE frame on the integer second axis: value-based, so tie
    // handling (a touch at the conversion's own second is OUTSIDE the
    // [-L, -1] frame) is identical on both engines
    val wr = Window.partitionBy(col(userCol)).orderBy(col("_sec"))
      .rangeBetween(-lookbackSec, -1)
    val counted = events
      .select(col(userCol), col(typeCol), sec.as("_sec"))
      .select(col(typeCol) +: count(when(isTouch, 1)).over(wr).as("_k") +:
        touchTypes.map(c =>
          count(when(col(typeCol) === c, 1)).over(wr).as(s"_c_$c")): _*)
      .filter(col(typeCol) === convType)
    val credits = touchTypes.map(c =>
      struct(lit(c).as("channel"),
        when(col("_k") > 0, expr(s"1000000L * `_c_$c` div _k")).otherwise(lit(0L))
          .as("credit"))) :+
      struct(lit("(none)").as("channel"),
        when(col("_k") === 0, lit(1000000L)).otherwise(lit(0L)).as("credit"))
    counted
      .select(explode(array(credits: _*)).as("e"))
      .select(col("e.channel").as("channel"), col("e.credit").as("credit"))
      .groupBy("channel")
      .agg(sum("credit").as("credit_ppm"),
        sum(when(col("credit") > 0, 1L).otherwise(0L)).as("n_conv_touched"))
      .filter(col("credit_ppm") > 0)
  }

  /** DuckDB mirror of [[linearAttribution]] — generated from the same
    * channel list so the credit stack can't drift. */
  def linearAttributionOracleSql(
      table: String, userCol: String, typeCol: String, tsCol: String,
      touchTypes: Seq[String], convType: String, lookbackSec: Long): String = {
    val touches = touchTypes.map(t => s"'$t'").mkString(", ")
    val chanCounts = touchTypes.zipWithIndex.map { case (c, i) =>
      s"count(CASE WHEN $typeCol = '$c' THEN 1 END) OVER wr AS c$i"
    }.mkString(",\n       |         ")
    val stack = touchTypes.zipWithIndex.map { case (c, i) =>
      s"SELECT '$c' AS channel, CASE WHEN k > 0 THEN 1000000 * c$i // k ELSE 0 END AS credit FROM conv"
    }.mkString("\n       |  UNION ALL ") +
      s"\n       |  UNION ALL SELECT '(none)', CASE WHEN k = 0 THEN 1000000 ELSE 0 END FROM conv"
    s"""WITH e AS (
       |  SELECT $userCol, $typeCol,
       |         CAST(epoch(date_trunc('second', $tsCol)) AS BIGINT) AS sec
       |  FROM $table
       |), conv AS (
       |  SELECT * FROM (
       |    SELECT $typeCol,
       |         count(CASE WHEN $typeCol IN ($touches) THEN 1 END) OVER wr AS k,
       |         $chanCounts
       |    FROM e
       |    WINDOW wr AS (PARTITION BY $userCol ORDER BY sec
       |                  RANGE BETWEEN $lookbackSec PRECEDING AND 1 PRECEDING)
       |  ) WHERE $typeCol = '$convType'
       |), credits AS (
       |  $stack
       |)
       |SELECT channel, CAST(SUM(credit) AS BIGINT) AS credit_ppm,
       |       CAST(SUM(CASE WHEN credit > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_conv_touched
       |FROM credits GROUP BY 1 HAVING SUM(credit) > 0""".stripMargin
  }

  /** Position-based (U-shaped) multi-touch attribution: 40% of each
    * conversion's credit to the FIRST touch in the lookback, 40% to the
    * LAST, 20% split over the middles (1 touch → 100%; 2 → 50/50). The
    * third member of the attribution family (last-touch, linear,
    * position) — same one-window-pass shape as [[linearAttribution]]:
    * no touch×conversion join, everything rides the RANGE frame.
    *
    * First/last are deterministic under ties: each touch encodes as a
    * zero-padded `(sec, id)` string prefix + its channel, and MIN/MAX
    * over that encoding is a total order both engines agree on (the
    * frame itself is value-based on seconds, so frame membership is
    * tie-safe too). Credits are integer ppm (`div`), mirrored exactly.
    */
  def positionAttribution(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      idCol: String, touchTypes: Seq[String], convType: String,
      lookbackSec: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(lookbackSec > 0, "lookbackSec must be positive")
    val sec = unix_timestamp(ts2(tsCol))
    val isTouch = col(typeCol).isin(touchTypes: _*)
    val wr = Window.partitionBy(col(userCol)).orderBy(col("_sec"))
      .rangeBetween(-lookbackSec, -1)
    val enc = concat(
      lpad(col("_sec").cast("string"), 10, "0"),
      lpad(col(idCol).cast("string"), 19, "0"),
      col(typeCol))
    val counted = events
      .select(col(userCol), col(typeCol), col(idCol), sec.as("_sec"))
      .withColumn("_enc", when(isTouch, enc))
      .select(col(typeCol) +:
        count(when(isTouch, 1)).over(wr).as("_k") +:
        min(col("_enc")).over(wr).as("_first") +:
        max(col("_enc")).over(wr).as("_last") +:
        touchTypes.map(c =>
          count(when(col(typeCol) === c, 1)).over(wr).as(s"_c_$c")): _*)
      .filter(col(typeCol) === convType)
      .withColumn("_fc", substring(col("_first"), 30, 1000))
      .withColumn("_lc", substring(col("_last"), 30, 1000))
    def chanCredit(c: String) = {
      val isF = when(col("_fc") === c, 1L).otherwise(0L)
      val isL = when(col("_lc") === c, 1L).otherwise(0L)
      val mid = col(s"_c_$c") - isF - isL
      when(col("_k") === 1, isF * 1000000L)
        .when(col("_k") === 2, (isF + isL) * 500000L)
        .when(col("_k") >= 3,
          isF * 400000L + isL * 400000L +
            expr(s"200000L div (_k - 2)") * mid)
        .otherwise(lit(0L))
    }
    val credits = touchTypes.map(c =>
      struct(lit(c).as("channel"), chanCredit(c).as("credit"))) :+
      struct(lit("(none)").as("channel"),
        when(col("_k") === 0, lit(1000000L)).otherwise(lit(0L)).as("credit"))
    counted
      .select(explode(array(credits: _*)).as("e"))
      .select(col("e.channel").as("channel"), col("e.credit").as("credit"))
      .groupBy("channel")
      .agg(sum("credit").as("credit_ppm"),
        sum(when(col("credit") > 0, 1L).otherwise(0L)).as("n_conv_touched"))
      .filter(col("credit_ppm") > 0)
  }

  /** DuckDB mirror of [[positionAttribution]]. */
  def positionAttributionOracleSql(
      table: String, userCol: String, typeCol: String, tsCol: String,
      idCol: String, touchTypes: Seq[String], convType: String,
      lookbackSec: Long): String = {
    val touches = touchTypes.map(t => s"'$t'").mkString(", ")
    val chanCounts = touchTypes.zipWithIndex.map { case (c, i) =>
      s"count(CASE WHEN $typeCol = '$c' THEN 1 END) OVER wr AS c$i"
    }.mkString(",\n       |         ")
    def credit(c: String, i: Int) =
      s"""CASE WHEN k = 1 THEN (CASE WHEN fc = '$c' THEN 1000000 ELSE 0 END)
         |            WHEN k = 2 THEN ((CASE WHEN fc = '$c' THEN 1 ELSE 0 END) + (CASE WHEN lc = '$c' THEN 1 ELSE 0 END)) * 500000
         |            WHEN k >= 3 THEN (CASE WHEN fc = '$c' THEN 400000 ELSE 0 END) + (CASE WHEN lc = '$c' THEN 400000 ELSE 0 END)
         |                 + (200000 // (k - 2)) * (c$i - (CASE WHEN fc = '$c' THEN 1 ELSE 0 END) - (CASE WHEN lc = '$c' THEN 1 ELSE 0 END))
         |            ELSE 0 END""".stripMargin
    val stack = touchTypes.zipWithIndex.map { case (c, i) =>
      s"SELECT '$c' AS channel, ${credit(c, i)} AS credit FROM conv"
    }.mkString("\n       |  UNION ALL ") +
      s"\n       |  UNION ALL SELECT '(none)', CASE WHEN k = 0 THEN 1000000 ELSE 0 END FROM conv"
    s"""WITH e AS (
       |  SELECT $userCol, $typeCol, $idCol,
       |         CAST(epoch(date_trunc('second', $tsCol)) AS BIGINT) AS sec,
       |         CASE WHEN $typeCol IN ($touches)
       |              THEN lpad(CAST(CAST(epoch(date_trunc('second', $tsCol)) AS BIGINT) AS VARCHAR), 10, '0')
       |                   || lpad(CAST($idCol AS VARCHAR), 19, '0') || $typeCol
       |         END AS enc
       |  FROM $table
       |), conv AS (
       |  SELECT * FROM (
       |    SELECT $typeCol,
       |         count(CASE WHEN $typeCol IN ($touches) THEN 1 END) OVER wr AS k,
       |         substr(min(enc) OVER wr, 30) AS fc,
       |         substr(max(enc) OVER wr, 30) AS lc,
       |         $chanCounts
       |    FROM e
       |    WINDOW wr AS (PARTITION BY $userCol ORDER BY sec
       |                  RANGE BETWEEN $lookbackSec PRECEDING AND 1 PRECEDING)
       |  ) WHERE $typeCol = '$convType'
       |), credits AS (
       |  $stack
       |)
       |SELECT channel, CAST(SUM(credit) AS BIGINT) AS credit_ppm,
       |       CAST(SUM(CASE WHEN credit > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_conv_touched
       |FROM credits GROUP BY 1 HAVING SUM(credit) > 0""".stripMargin
  }

  /** 3-step behavioral path mining ("what do users do next"): every
    * consecutive (s1 → s2 → s3) event-type trigram per user, counted
    * corpus-wide — the sequence-pattern table behind sankey/next-action
    * readouts, extending [[transitions]]' bigrams one step.
    *
    * Scale shape: ONE window pass on one (user) exchange produces both
    * leads; the count collapses to the ≤|types|³-sized path table.
    * No self-joins, no per-user collect.
    */
  def pathTrigrams(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col("_sec"), col(idCol))
    events
      .select(col(userCol), col(typeCol), col(idCol),
        unix_timestamp(ts2(tsCol)).as("_sec"))
      .select(col(typeCol).as("s1"),
        lead(col(typeCol), 1).over(w).as("s2"),
        lead(col(typeCol), 2).over(w).as("s3"))
      .filter(col("s3").isNotNull)
      .groupBy("s1", "s2", "s3")
      .agg(count(lit(1)).as("cnt"))
  }

  /** DuckDB mirror of [[pathTrigrams]]. */
  def pathTrigramsOracleSql(
      table: String, userCol: String, typeCol: String, tsCol: String,
      idCol: String): String =
    s"""WITH e AS (
       |  SELECT $userCol, $typeCol, $idCol,
       |         CAST(epoch(date_trunc('second', $tsCol)) AS BIGINT) AS sec
       |  FROM $table
       |), t AS (
       |  SELECT $typeCol AS s1,
       |         lead($typeCol, 1) OVER win AS s2,
       |         lead($typeCol, 2) OVER win AS s3
       |  FROM e
       |  WINDOW win AS (PARTITION BY $userCol ORDER BY sec, $idCol)
       |)
       |SELECT s1, s2, s3, count(*) AS cnt
       |FROM t WHERE s3 IS NOT NULL GROUP BY 1, 2, 3""".stripMargin

  /** DuckDB mirror of [[timeToConvert]]. */
  def timeToConvertOracleSql(
      table: String, userCol: String, typeCol: String, tsCol: String,
      idCol: String, touchTypes: Seq[String], convType: String,
      lookbackSec: Long): String = {
    val touches = touchTypes.map(t => s"'$t'").mkString(", ")
    s"""WITH e AS (
       |  SELECT $userCol, $typeCol, $idCol,
       |         CAST(epoch(date_trunc('second', $tsCol)) AS BIGINT) AS sec
       |  FROM $table
       |), t AS (
       |  SELECT *,
       |         last_value(CASE WHEN $typeCol IN ($touches) THEN sec END IGNORE NULLS)
       |           OVER win AS touch_sec,
       |         last_value(CASE WHEN $typeCol IN ($touches) THEN $typeCol END IGNORE NULLS)
       |           OVER win AS touch_type
       |  FROM e
       |  WINDOW win AS (PARTITION BY $userCol ORDER BY sec, $idCol
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |), lats AS (
       |  SELECT touch_type AS channel, sec - touch_sec AS lat
       |  FROM t
       |  WHERE $typeCol = '$convType' AND touch_sec IS NOT NULL
       |    AND touch_sec >= sec - $lookbackSec
       |)
       |SELECT channel, count(*) AS n_conv,
       |       round(CAST(SUM(lat) AS DOUBLE) / count(*), 6) AS mean_sec,
       |       round(quantile_cont(lat, 0.5), 6) AS p50_sec,
       |       round(quantile_cont(lat, 0.9), 6) AS p90_sec
       |FROM lats GROUP BY 1""".stripMargin
  }

  /** DuckDB mirror of [[lastTouchAttribution]] — generated from the same
    * touch list and lookback so the two can't drift. */
  def lastTouchAttributionOracleSql(
      table: String, userCol: String, typeCol: String, tsCol: String,
      idCol: String, touchTypes: Seq[String], convType: String,
      lookbackSec: Long): String = {
    val touches = touchTypes.map(t => s"'$t'").mkString(", ")
    s"""WITH e AS (
       |  SELECT $userCol, $typeCol, $idCol,
       |         CAST(epoch(date_trunc('second', $tsCol)) AS BIGINT) AS sec
       |  FROM $table
       |), t AS (
       |  SELECT *,
       |         last_value(CASE WHEN $typeCol IN ($touches) THEN sec END IGNORE NULLS)
       |           OVER win AS touch_sec,
       |         last_value(CASE WHEN $typeCol IN ($touches) THEN $typeCol END IGNORE NULLS)
       |           OVER win AS touch_type
       |  FROM e
       |  WINDOW win AS (PARTITION BY $userCol ORDER BY sec, $idCol
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |)
       |SELECT CASE WHEN touch_sec IS NOT NULL AND touch_sec >= sec - $lookbackSec
       |            THEN touch_type ELSE '(none)' END AS channel,
       |       count(*) AS n_conv, count(DISTINCT $userCol) AS n_users
       |FROM t WHERE $typeCol = '$convType' GROUP BY 1""".stripMargin
  }
}
