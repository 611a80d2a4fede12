package graft
package registry

import graft.core.Tables
import graft.dedup.Dedup
import graft.functions.VectorOps
import graft.ops.{CohortOps, Recodes}
import graft.sim.{Quantized, Similarity}
import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** event/sessionization analytics — one slice of the driver registry.
  *
  * Split out of Shared.scala in r12 (maintainability: the single file
  * had reached 8.7k lines). PURE CODE MOTION: entry bodies and oracle SQL
  * are byte-identical to the pre-split registry; SparkEntry composes the
  * slices back into the same `queries`/`oracleSql` maps.
  */
private[graft] object EventsRegistry {
  import Shared._

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "ev_hour_agg" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
        .agg(
          count(lit(1)).as("cnt"),
          countDistinct(col("user_id")).as("d_users"),
          dsum(col("value")).as("sum_value"))),

    "ev_sessionize" -> ((s, d) => {
      val ts2  = date_trunc("second", col("ts"))
      val w    = Window.partitionBy("user_id").orderBy(col("ts2"), col("event_id"))
      val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("ts2", ts2)
        .withColumn("prev", lag(col("ts2"), 1).over(w))
        .withColumn("is_new",
          when(col("prev").isNull ||
            (unix_timestamp(col("ts2")) - unix_timestamp(col("prev"))) > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum("is_new").over(wCum))
        .groupBy("user_id", "session_id").agg(count(lit(1)).as("n_events"))
    }),

    // ordered funnel over the event stream: per-stage entity counts where
    // each stage's earliest event strictly follows the previous stage's —
    // the reference cohort query's "A then B" shape generalized to k
    // stages (per-entity aggregation BEFORE every join; see FunnelOps)
    "ev_funnel" -> ((s, d) =>
      graft.ops.FunnelOps.funnel(
        Tables.events(s, d), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))),

    // conversion-window funnel: each stage must land within 7 days of the
    // previous one — the "converted within X" product form; same k pruned
    // scans + k entity-keyed joins, gap predicate fused into each stage
    "ev_funnel_windowed" -> ((s, d) =>
      graft.ops.FunnelOps.funnel(
        Tables.events(s, d), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), maxGapSec = Some(7L * 86400L))),

    // cohort retention matrix: entities cohorted by first-event date,
    // distinct-active counts per (cohort_date, week_offset)
    "ev_retention" -> ((s, d) =>
      graft.ops.FunnelOps.retention(Tables.events(s, d), "user_id", "ts")),

    // event-type transition frequencies (the Markov view): one window
    // pass per entity, |types|²-bounded output
    "ev_transitions" -> ((s, d) =>
      graft.ops.FunnelOps.transitions(
        Tables.events(s, d), "user_id", "event_type", "ts", "event_id")),

    // last-touch attribution: every purchase credited to the user's most
    // recent preceding touch within 7 days — ONE window pass on one
    // entity exchange, never a conversions×touches range self-join
    "ev_attribution" -> ((s, d) =>
      graft.ops.FunnelOps.lastTouchAttribution(
        Tables.events(s, d), "user_id", "event_type", "ts", "event_id",
        touchTypes = Seq("view", "click", "signup"), convType = "purchase",
        lookbackSec = 7L * 86400L)),

    // two-proportion z-test between deterministic hash-split arms — the
    // experiment readout: per-user conversion collapses first (one
    // data-sized hash-agg), the test statistic is scalar math on one row;
    // arm assignment rides the portable permille hash so the split —
    // and therefore the z — replays exactly on any engine
    "ab_ztest" -> ((s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 3L, 1L)
          .otherwise(0L).as("conv"))
        .select(
          when(permilleHash(col("user_id"), ":ab") < 500, "A").otherwise("B").as("arm"),
          col("conv"))
      val c = perUser.agg(
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "A", col("conv")).otherwise(0L)).as("conv_a"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === "B", col("conv")).otherwise(0L)).as("conv_b"))
      val p = (col("conv_a") + col("conv_b")).cast("double") / (col("n_a") + col("n_b"))
      c.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        when(col("conv_a") + col("conv_b") === lit(0L) ||
          col("conv_a") + col("conv_b") === col("n_a") + col("n_b"), lit(0.0))
          .otherwise(round(
            (col("conv_a").cast("double") / col("n_a") -
              col("conv_b").cast("double") / col("n_b")) /
              sqrt(p * (lit(1.0) - p) * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))),
            6)).as("z_score"))
    }),
      // all-converted / none-converted pools have zero pooled variance —
      // the proportions are equal by construction, so z is 0, not a ÷0

    // sample-ratio-mismatch guardrail on the same hash arms as ab_ztest:
    // 1-df chi² of the realized split vs the designed 50/50 — the check
    // an experiment platform runs before trusting any metric readout
    "ab_srm" -> ((s, d) => {
      val perUser = Tables.events(s, d).select(col("user_id")).distinct()
        .select(when(permilleHash(col("user_id"), ":ab") < 500, "A")
          .otherwise("B").as("arm"))
      graft.ops.ExperimentOps.srmCheck(perUser, "arm", "A", "B", ratioA = 0.5)
    }),

    // semi-structured props extraction (regex form, engine-comparable)
    "ev_props_extract" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("k", regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("int"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum(col("k").cast("long")).as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))),

    // semi-structured props via NATIVE JSON parsing (from_json with an
    // explicit schema — codegen'd Jackson parse, no UDF), oracled against
    // DuckDB's json_extract. The schema-on-read contract is what scales:
    // a typed struct column downstream, never per-query regexes.
    "ev_props_json" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum(col("k").cast("long")).as("sum_k"),
          countDistinct(col("k")).as("d_k"))),

    // M13 vector form: ml.stat.ChiSquareTest over the CATEGORICAL one-hot
    // features (chi2 is a contingency test — continuous scaled features
    // explode its per-distinct-value cardinality). The STATISTICS are the
    // textbook Pearson sum over the contingency table, so they oracle
    // exactly (round-6, same as ml_chi2); p-values stay available via
    // FeatureScoring.chi2 but are model-library-specific CDF evaluations,
    // so the declared query emits the hash-comparable statistics.
    "ml_chi2_vec" -> ((s, d) => {
      val raw = graft.ml.Features.orderFeatureTable(s, d)
        .filter(pmod(col("id"), lit(10L)) === 0L)
      val asm = new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(Array("prio_1", "prio_2", "prio_3", "prio_4", "prio_5"))
        .setOutputCol("features")
      graft.ml.FeatureScoring.chi2(asm.transform(raw), "features", "label")
        .select(col("feature_idx"), round(col("chi2_stat"), 6).as("chi2_stat"))
    }),
  )

  val oracles: Seq[(String, String)] = Seq(
    "ev_hour_agg" ->
      """SELECT date_trunc('hour', ts) AS hour_ts, event_type, count(*) AS cnt,
        |       count(DISTINCT user_id) AS d_users,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "ev_props_extract" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(SUM(TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER)) AS BIGINT) AS sum_k,
        |  MIN(TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER)) AS min_k,
        |  MAX(TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER)) AS max_k
        |FROM events GROUP BY 1""".stripMargin,

    "ev_props_json" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  count(DISTINCT CAST(json_extract(props, '$.k') AS INTEGER)) AS d_k
        |FROM events GROUP BY 1""".stripMargin,

    "ev_sessionize" -> sessionizeSql,

    // Pearson chi2 per one-hot feature. Unlike ml_chi2 (whose Spark side
    // also sums only observed cells), ml.stat.ChiSquareTest sums over the
    // FULL observed-values grid — a zero-observed (x, y) cell contributes
    // (0−E)²/E = E. Mirror that: cross observed x values with observed y
    // values per feature and coalesce missing joint counts to 0, so the
    // oracle stays exact even when the subsample leaves a cell empty.
    "ml_chi2_vec" ->
      s"""WITH c AS (
         |$cohortSqlCore
         |), f AS (
         |  SELECT o.o_orderpriority AS prio, c.label
         |  FROM c JOIN orders o ON c.o_orderkey = o.o_orderkey
         |  WHERE o.o_orderkey % 10 = 0
         |), s AS (
         |  SELECT 0 AS feature_idx, CASE WHEN prio = '1-URGENT' THEN 1 ELSE 0 END AS x, label AS y FROM f
         |  UNION ALL SELECT 1, CASE WHEN prio = '2-HIGH' THEN 1 ELSE 0 END, label FROM f
         |  UNION ALL SELECT 2, CASE WHEN prio = '3-MEDIUM' THEN 1 ELSE 0 END, label FROM f
         |  UNION ALL SELECT 3, CASE WHEN prio = '4-NOT SPECIFIED' THEN 1 ELSE 0 END, label FROM f
         |  UNION ALL SELECT 4, CASE WHEN prio = '5-LOW' THEN 1 ELSE 0 END, label FROM f
         |), joint AS (
         |  SELECT feature_idx, x, y, count(*) AS nxy FROM s GROUP BY 1, 2, 3
         |), grid AS (
         |  SELECT xs.feature_idx, xs.x, ys.y
         |  FROM (SELECT DISTINCT feature_idx, x FROM s) xs
         |  JOIN (SELECT DISTINCT feature_idx, y FROM s) ys
         |    ON xs.feature_idx = ys.feature_idx
         |), fullgrid AS (
         |  SELECT g.feature_idx, g.x, g.y, COALESCE(j.nxy, 0) AS nxy
         |  FROM grid g LEFT JOIN joint j
         |    ON g.feature_idx = j.feature_idx AND g.x = j.x AND g.y = j.y
         |), e AS (
         |  SELECT feature_idx, nxy,
         |         SUM(nxy) OVER (PARTITION BY feature_idx) AS n,
         |         SUM(nxy) OVER (PARTITION BY feature_idx, x) AS nx,
         |         SUM(nxy) OVER (PARTITION BY feature_idx, y) AS ny
         |  FROM fullgrid
         |)
         |SELECT CAST(feature_idx AS INTEGER) AS feature_idx,
         |       round(SUM((nxy - CAST(nx AS DOUBLE) * ny / n) * (nxy - CAST(nx AS DOUBLE) * ny / n)
         |              / (CAST(nx AS DOUBLE) * ny / n)), 6) AS chi2_stat
         |FROM e GROUP BY 1""".stripMargin,

    "ab_srm" -> graft.ops.ExperimentOps.srmOracleSql(
      s"""SELECT CASE WHEN ${permilleHashSql("user_id", ":ab", 1000L)} < 500
         |            THEN 'A' ELSE 'B' END AS arm
         |FROM (SELECT DISTINCT user_id FROM events)""".stripMargin,
      "A", "B", ratioA = 0.5),

    "ev_funnel_windowed" -> graft.ops.FunnelOps.funnelOracleSql(
      "events", "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), maxGapSec = Some(7L * 86400L)),

    "ev_funnel" -> graft.ops.FunnelOps.funnelOracleSql(
      "events", "user_id", "event_type", "ts", Seq("view", "click", "purchase")),

    "ev_retention" -> graft.ops.FunnelOps.retentionOracleSql(
      "events", "user_id", "ts"),

    "ev_transitions" -> graft.ops.FunnelOps.transitionsOracleSql(
      "events", "user_id", "event_type", "ts", "event_id"),

    "ev_attribution" -> graft.ops.FunnelOps.lastTouchAttributionOracleSql(
      "events", "user_id", "event_type", "ts", "event_id",
      touchTypes = Seq("view", "click", "signup"), convType = "purchase",
      lookbackSec = 7L * 86400L),

    "ab_ztest" ->
      s"""WITH pu AS (
         |  SELECT user_id,
         |         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 3
         |              THEN 1 ELSE 0 END AS conv
         |  FROM events GROUP BY 1
         |), arms AS (
         |  SELECT CASE WHEN ${permilleHashSql("user_id", ":ab", 1000L)} < 500
         |              THEN 'A' ELSE 'B' END AS arm, conv
         |  FROM pu
         |), c AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
         |    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS conv_b
         |  FROM arms
         |)
         |SELECT n_a, conv_a, n_b, conv_b,
         |       CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN 0.0
         |            ELSE round(
         |              (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) /
         |              sqrt(CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)
         |                   * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
         |                   * (1.0 / n_a + 1.0 / n_b)), 6) END AS z_score
         |FROM c""".stripMargin,
  )
}
