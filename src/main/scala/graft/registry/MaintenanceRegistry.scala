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

/** incremental maintenance, CDC/SCD2, data quality, TPC-H SQL tier, graphs, time series — one slice of the driver registry.
  *
  * Split out of Shared.scala in r12 (maintainability: the single file
  * had reached 8.7k lines). PURE CODE MOTION: entry bodies and oracle SQL
  * are byte-identical to the pre-split registry; SparkEntry composes the
  * slices back into the same `queries`/`oracleSql` maps. r13: misfiled
  * entries re-homed to their named family slice (pure motion again, same
  * duplicate-key guard).
  */
private[graft] object MaintenanceRegistry {
  import Shared._

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "scd2_merge" -> ((s, d) => {
      graft.ops.MergeOps.scd2(
          scd2Snapshots(s, d), "o_orderkey", "ts", tracked = Seq("o_orderstatus"))
        .select("o_orderkey", "o_orderstatus", "valid_from", "valid_to", "is_current")
    }),

    "merge_upsert" -> ((s, d) => {
      val base = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate").as("ts"), col("o_orderstatus"))
      val upd = t(s, d, "orders")
        .filter(permilleHash(col("o_orderkey"), ":up42") < 100)
        .select(col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("ts"),
          lit("X").as("o_orderstatus"))
      graft.ops.MergeOps.upsertLatest(
          base.unionByName(upd), "o_orderkey", "ts", tie = "o_orderstatus")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
    }),

    // compaction roundtrip: many-small-files slice → Sinks.compact →
    // read-back must aggregate identically to the source (and the file
    // count drops to the target — asserted in SinksSpec)
    "s13_compact_roundtrip" -> ((s, d) => {
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_s13_${new java.io.File(d).getName}"
      t(s, d, "orders")
        .filter(permilleHash(col("o_orderkey"), ":cp42") < 200)
        .repartition(16) // simulate incremental small-file buildup
        .write.mode("overwrite").parquet(s"$base/small")
      graft.core.Sinks.compact(s, s"$base/small", 2, s"$base/compacted")
      s.read.parquet(s"$base/compacted")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
    }),

    // schema evolution: two parquet generations (the later one adds a
    // column) read back through ONE mergeSchema scan — old-generation rows
    // surface the new column as null, exactly like a production landing
    // zone mid-migration. The aggregate pins both the row routing and the
    // null semantics of the evolved column
    "s15_schema_evolution" -> ((s, d) => {
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_s15_${new java.io.File(d).getName}"
      val orders = t(s, d, "orders")
      orders.filter(permilleHash(col("o_orderkey"), ":se42") < 500)
        .select("o_orderkey", "o_orderstatus")
        .write.mode("overwrite").parquet(s"$base/gen1")
      orders.filter(permilleHash(col("o_orderkey"), ":se42") >= 500)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.mode("overwrite").parquet(s"$base/gen2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$base/gen1", s"$base/gen2")
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("cnt"),
          sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("n_legacy"),
          dsum(coalesce(col("o_totalprice"), lit(0.0))).as("sum_price"))
    }),

    // exact weighted quantiles: "price percentiles weighted by units" —
    // integer cumulative-weight thresholds (1000·cum ≥ p·W) through the
    // distributed-CDF machinery; no double comparison can flip on an ulp
    "a16_weighted_quantiles" -> ((s, d) =>
      graft.ops.WeightedStats.weightedQuantiles(
        t(s, d, "lineitem"), col("l_extendedprice"), col("l_quantity"),
        Seq(250, 500, 750, 900))),

    // quantile matching: rewrite cohort F's price distribution onto
    // cohort O's (batch-effect correction) — both global rankings ride
    // GlobalRowNumber, endpoints arrive by integer equi-joins, and every
    // float step mirrors the oracle token-for-token
    "fe_quantile_match" -> ((s, d) => {
      val orders = t(s, d, "orders")
      graft.ops.QuantileMatch.matchQuantiles(
        orders.filter(col("o_orderstatus") === "F"),
        orders.filter(col("o_orderstatus") === "O"),
        "o_orderkey", "o_totalprice")
    }),

    // corpus-level LM quality score (perplexity filter)
    "t_bigram_lm" -> ((s, d) =>
      graft.text.BigramLm.docScores(
        t(s, d, "documents"), "doc_id", "text", minCount = 3L)),

    // interpolated Kneser-Ney at D = 3/4: every probability an exact
    // rational of corpus counts (context counts, not occurrences, drive
    // the backoff — the smoothing every pre-neural LM shipped), ONE
    // correctly-rounded divide per bigram; top-50 by count
    "t_kn_bigram" -> ((s, d) =>
      graft.text.BigramLm.kneserNey(t(s, d, "documents"), "text", topK = 50)),

    // exact decimal-accumulated Pearson correlations — reproducible
    // data-card statistics (builtin corr is merge-order-dependent)
    "a11_corr" -> ((s, d) =>
      graft.ops.StatsOps.corrPairs(
        t(s, d, "lineitem"), Seq("l_quantity", "l_extendedprice", "l_discount"))),

    // per-segment OLS trend coefficients with exact decimal moments —
    // single scan for all five moment sums, scalar math on 1-row-per-group
    "a12_ols_group" -> ((s, d) =>
      graft.ops.RegressionOps.olsByGroup(
        t(s, d, "lineitem"), Seq("l_returnflag"), "l_quantity", "l_extendedprice")),

    // robust (median/MAD) outlier gate per segment — exact distributed
    // percentiles, round-6 pinned stats so the gate can't flip on ulp
    "fe_mad_outliers" -> ((s, d) =>
      graft.ops.RobustStats.madOutliers(
        t(s, d, "orders"), Seq("o_orderstatus"), "o_totalprice", k = 3.0)),

    // equi-depth decile binning over exact global quantiles — the
    // QuantileDiscretizer shape: one percentile pass, cutpoints broadcast
    "fe_quantile_bin" -> ((s, d) =>
      graft.ops.RobustStats.quantileBins(
        t(s, d, "orders"), "o_totalprice", (1 to 9).map(_ / 10.0))),

    // RFM quintile segmentation — recency/frequency/monetary scores per
    // customer: ONE hash-agg collapses the data to the |customers| frame;
    // each quintile is a GlobalRowNumber global rank (range-partitioned,
    // parallel per-partition windows — NO SinglePartition window) turned
    // into its exact ntile(5) bucket by integer arithmetic, with
    // entity-key tiebreaks so every score is deterministic. At 100 TB the
    // |customers| frame is ~10⁹ rows — three parallel ranked passes,
    // never three one-task sorts
    "fe_rfm" -> ((s, d) => {
      import graft.ops.GlobalRowNumber
      val per = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("frequency"),
          dsum(col("o_totalprice")).as("monetary"))
        .withColumn("recency",
          datediff(lit("1998-08-02").cast("date"), col("last_order")).cast("long"))
      val (r1, n, rel1) = GlobalRowNumber.withRowNumberAndCount(
        per, "_rr", col("recency").asc, col("o_custkey").asc)
      val (r2, rel2) = GlobalRowNumber.withRowNumberReleasable(
        r1, "_fr", col("frequency").desc, col("o_custkey").asc)
      val (r3, rel3) = GlobalRowNumber.withRowNumberReleasable(
        r2, "_mr", col("monetary").desc, col("o_custkey").asc)
      val out = r3.select(
        col("o_custkey"), col("recency"), col("frequency"), col("monetary"),
        GlobalRowNumber.ntileFromRank(col("_rr"), n, 5).as("r_score"),
        GlobalRowNumber.ntileFromRank(col("_fr"), n, 5).as("f_score"),
        GlobalRowNumber.ntileFromRank(col("_mr"), n, 5).as("m_score"))
      val collected = out.cache()
      collected.count()
      rel1(); rel2(); rel3()
      collected
    }),
      // materialize the |customers|-sized result once, then drop the three
      // internal range-partition pins — one session pin instead of three
      // widening ones (they otherwise accumulate across a 300-query bench)

    // Pareto/ABC analysis — rank customers by spend, classify by exact
    // cumulative-share thresholds (A ≤ 80%, B ≤ 95%): the cumulative
    // spend is a RunningTotal distributed prefix sum in integer CENTS
    // (range-partitioned, parallel per-partition windows — NO
    // SinglePartition window; grand total rides the same counts pass);
    // the share compare is decimal×integer (cum·20 ≤ tot·16), so the
    // class boundary can never flip on a double ulp
    "a15_pareto_abc" -> ((s, d) => {
      val per = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
        .withColumn("_cents", (col("spend") * 100).cast("long"))
      val (cum, totCents) = graft.ops.RunningTotal.withRunningSum(
        per, col("_cents"), "_cum_cents",
        col("spend").desc, col("o_custkey").asc)
      val cumD = col("_cum_cents").cast("decimal(38,0)")
      val totD = col("_rt_total").cast("decimal(38,0)")
      cum.crossJoin(broadcast(totCents))
        .groupBy(
          when(cumD * 20 <= totD * 16, "A")
            .when(cumD * 20 <= totD * 19, "B")
            .otherwise("C").as("abc_class"))
        .agg(count(lit(1)).as("n_customers"),
          sum("spend").cast("double").as("class_spend"))
    }),

    // weight-of-evidence + information value over exact decile bins —
    // the credit-scoring encoder: distributed-CDF cutpoints broadcast
    // onto the scan, WOE/IV math on the |bins|-sized table
    "fe_binned_woe" -> ((s, d) =>
      graft.ml.TargetEncoding.woeBinned(
        t(s, d, "orders").select(col("o_totalprice"), col("o_orderstatus")),
        "o_totalprice", col("o_orderstatus") === "F", (1 to 9).map(_ / 10.0))),

    // per-entity autoregressive lag features over observed daily sums —
    // one hash-agg to the daily table, every lag from one window pass
    "fe_lag_features" -> ((s, d) =>
      graft.ops.TimeSeriesOps.lagFeatures(
        Tables.events(s, d), "user_id", "ts", "value", Seq(1, 2))),

    // gaps-and-islands: maximal consecutive-active-day streaks per user —
    // anchor = day − row_number is constant within a run; two exchanges,
    // both on the user key, no self-join, no gap rows materialized
    "ev_streaks" -> ((s, d) =>
      graft.ops.TimeSeriesOps.activityStreaks(Tables.events(s, d), "user_id", "ts")),

    // lag-1..3 autocorrelation of the per-type daily value sums — the
    // seasonality probe before any temporal model; exact DECIMAL daily
    // sums, row-lags over observed days, corr rounded to 6 dp
    "ts_acf" -> ((s, d) =>
      graft.ops.TimeSeriesOps.autocorr(
        Tables.events(s, d), "event_type", "ts", "value", maxLag = 3)),

    // CUSUM change-point scores: the sequential max(0, s+(x−μ)) recursion
    // expressed as cumulative-sum minus running-min — two window passes,
    // one exchange, all-integer cents (no mean division ever happens)
    "ts_cusum" -> ((s, d) =>
      graft.ops.TimeSeriesOps.cusum(
        Tables.events(s, d), "event_type", "ts", "value")),

    // day-of-week seasonal indices of the daily event-count series — the
    // decomposition step before deseasonalized anomaly checks; raw events
    // collapse to the day grain in one hash-agg, the index table is 7 rows
    "ts_seasonal_dow" -> ((s, d) =>
      graft.ops.TimeSeriesOps.seasonalDow(Tables.events(s, d), "ts")),

    // seasonal-naive forecast backtest: ŷ(day) = y(day − 7) per series,
    // scored only where the lag is observed — MAE on exact cent-scale
    // sums, MAPE via nano-scaled integer terms so the mean is
    // order-independent; one hash-agg + one self-join on (type, day−7)
    "ts_backtest_naive" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("v"))
      val prev = daily.select(col("event_type"),
        date_add(col("day"), 7).as("day"), col("v").as("pv"))
      daily.join(prev, Seq("event_type", "day"))
        .filter(col("v") > 0)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_days"),
          round(sum(abs(col("v") - col("pv"))).cast("double") / count(lit(1)), 6)
            .as("mae"),
          round(sum(round(abs((col("v") - col("pv")).cast("double")) /
              col("v").cast("double") * 1e9).cast("long"))
            / count(lit(1)) / 1e9, 9).as("mape"))
    }),
          // MAE accumulates in exact decimal; ONE double conversion
          // MAPE terms are per-row doubles rounded to integer nanos, so
          // the mean is an exact long sum — order-independent

    // weighted sampling WITHOUT replacement (Efraimidis–Spirakis clocks
    // on the portable hash): key = −ln(u)/w, global TakeOrdered(k) — the
    // "sample k docs ∝ quality" curation primitive, deterministic and
    // resumable where an RNG sample is neither
    // deterministic domain-mix rebalancing (DoReMi/Pile-style target
    // weights): feasible total T = min_d(n_d/w_d) from the |domains|-row
    // count table, each domain keeps its floor(w_d·T) smallest-hash
    // members — reproducible, engine-portable, no RNG; the only
    // data-sized exchange is the per-domain rank window
    "o20_domain_mix" -> ((s, d) =>
      graft.ops.DomainMix.mixCounts(
        t(s, d, "documents"), "lang", "doc_id",
        permilleHash1M(col("doc_id"), ":mix"),
        Map("en" -> 0.4, "de" -> 0.15, "es" -> 0.15,
          "fr" -> 0.15, "zh" -> 0.15))),

    // temperature-scaled mixture (α = 1/2): weights √n_d derived from
    // the data, quota k_d = ⌊√n_d · min√n_e⌋ — rare domains kept whole,
    // big ones cut toward the geometric middle; sqrt/multiply are IEEE-
    // correctly-rounded so the quota arithmetic is engine-exact. Rides
    // the same GlobalRowNumber rank as o20 (no per-domain window sort)
    "o21_temp_mix" -> ((s, d) =>
      graft.ops.DomainMix.temperatureMixCounts(
        t(s, d, "documents"), "lang", "doc_id",
        permilleHash1M(col("doc_id"), ":mix"))),

    "o18_priority_sample" -> ((s, d) =>
      graft.ops.PrioritySampling.sample(
        t(s, d, "documents"), "doc_id", "n_chars", k = 500)),

    // one-pass table profile (multi-distinct Expand: one scan, one
    // exchange for every column's null/distinct/min/max)
    "dp_profile" -> ((s, d) =>
      graft.ops.Profiler.profile(
        t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus"))),

    // BM25 keyword relevance over the corpus — explode filtered to the
    // query terms before aggregation; df/avgdl broadcast onto the scoring
    "t_bm25" -> ((s, d) =>
      graft.text.Bm25.scores(
        t(s, d, "documents"), "doc_id", "text",
        Seq("join", "window", "stream", "vector"))),

    // incremental aggregate maintenance: snapshot ⊕ CDC delta must equal
    // the full recompute the oracle runs — refreshing a rollup costs
    // |delta| + |groups|, never a base-table rescan
    "inc_agg_maintain" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val h = permilleHash(col("o_orderkey"), ":inc42")
      val deletes = orders.filter(h < 50).withColumn("op", lit("D"))
      val inserts = orders.filter(h >= 950)
        .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
        .withColumn("op", lit("I"))
      val snap = graft.ops.IncrementalAgg.snapshot(
        orders, Seq("o_orderstatus"), "o_totalprice")
      graft.ops.IncrementalAgg.maintain(
          snap, deletes.unionByName(inserts), Seq("o_orderstatus"), "o_totalprice")
        .select(col("o_orderstatus"), col("cnt"),
          col("sum_o_totalprice").cast("double").as("sum_price"))
    }),

    // incremental JOIN maintenance (the join analog of inc_agg_maintain):
    // maintained = snapshot + ΔA⋈B + A⋈ΔB + ΔA⋈ΔB with multiplied signs —
    // deltas on BOTH sides (order deletes+inserts, customer deletes), the
    // base tables never re-join; the oracle recomputes the modified join
    // from scratch and must agree bit-for-bit (exact decimal sums inside,
    // ONE IEEE conversion at the DOUBLE output boundary)
    "inc_join_maintain" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val cust = t(s, d, "customer")
      val hO = permilleHash(col("o_orderkey"), ":ijm")
      val hC = permilleHash(col("c_custkey"), ":ijmc")
      val delA = orders.filter(hO < 50).withColumn("sign", lit(-1L))
      val insA = orders.filter(hO >= 950)
        .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
        .withColumn("sign", lit(1L))
      val delB = cust.filter(hC < 30).withColumn("sign", lit(-1L))
      val snap = joinSnapshotCached(s, d)
      graft.ops.JoinMaintenance.maintain(
        snap, orders, delA.unionByName(insA), cust, delB,
        "o_custkey", "c_custkey", "c_nationkey", "o_totalprice")
        .withColumn("sum_v", col("sum_v").cast("double"))
    }),
      // the snapshot is session-memoized state (joinSnapshotCached): the
      // timed work is |Δ|-joins + the |groups| merge, never the base join

    // interval sweep-line: peak concurrent spans + earliest instant it is
    // reached — distributed running sum over event time (no SinglePartition
    // exchange), the DriftOps-CDF shape applied to interval analytics
    "ev_peak_concurrency" -> ((s, d) => {
      val start = unix_timestamp(date_trunc("second", col("ts")))
      val dur = greatest(lit(1L), floor(col("value") * 10).cast("long"))
      graft.ops.SweepLine.peakConcurrency(
        Tables.events(s, d).select(start.as("st"), (start + dur).as("en")),
        col("st"), col("en"))
    }),

    // trailing-24h rolling sum/count per event — RANGE frame over epoch
    // seconds: one exchange on the entity, streaming accumulation inside
    // each sorted partition (no self-join, no per-row probe)
    "ev_rolling24h" -> ((s, d) =>
      graft.ops.TimeSeriesOps.rollingAgg(
        Tables.events(s, d), "user_id", "ts", "value", "event_id", 86400L)),

    // dense daily panel with forward fill — sequence()+explode grid
    // (executor-side, never a driver loop), daily agg BEFORE the grid
    // join so everything past the first agg is |users×days|-sized
    "ev_gapfill_daily" -> ((s, d) =>
      graft.ops.TimeSeriesOps.gapFillDaily(
        Tables.events(s, d), "user_id", "ts", "value")),

    // cumulative distinct users per day — each user counted once on their
    // FIRST day (one data-sized hash-agg); the running sum is over the
    // |days|-sized daily table, never a growing distinct window state
    "ev_cum_uniques" -> ((s, d) =>
      graft.ops.TimeSeriesOps.cumulativeUniques(
        Tables.events(s, d), "user_id", "ts")),

    // rolling 7-day active users (WAU) — distinct (user, day) collapses
    // the data first, each active day explodes onto the 7 days it is
    // visible from, one distinct-count per day; never a sliding
    // count-distinct over raw events
    "ev_rolling_wau" -> ((s, d) =>
      graft.ops.TimeSeriesOps.rollingActiveUsers(
        Tables.events(s, d), "user_id", "ts", windowDays = 7)),

    // weekly signup-cohort churn: one hash-agg to the per-user
    // (first_day, last_day) frame; "churned" = inactive for the last 7
    // days of the observation window, the horizon a window-max over the
    // |users|-sized frame — the data is read once
    "ev_churn_cohorts" -> ((s, d) => {
      val per = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("first_day"),
          max(to_date(col("ts"))).as("last_day"))
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      per
        .withColumn("horizon", date_sub(max(col("last_day")).over(wAll), 7))
        .groupBy(date_trunc("week", col("first_day")).cast("date").as("cohort_week"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("last_day") < col("horizon"), 1L).otherwise(0L)).as("n_churned"))
    }),

    // DAU/MAU stickiness per day — both sides collapse to per-day
    // distinct counts first (the MAU side via the WAU explode shape), so
    // the ratio join touches |days|-sized frames only
    "ev_stickiness" -> ((s, d) => {
      val dau = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .groupBy("day").agg(count(lit(1)).as("dau"))
      val mau = graft.ops.TimeSeriesOps.rollingActiveUsers(
        Tables.events(s, d), "user_id", "ts", windowDays = 28)
        .withColumnRenamed("wau", "mau")
      dau.join(mau, "day")
        .select(col("day"), col("dau"), col("mau"),
          round(col("dau").cast("double") / col("mau"), 6).as("stickiness"))
    }),

    // trailing-window z-score anomaly flag — both moments accumulate in
    // DECIMAL inside the same single-exchange RANGE frame, so the alert
    // can't flip with the executor count
    "ev_anomaly" -> ((s, d) =>
      graft.ops.TimeSeriesOps.rollingAnomaly(
        Tables.events(s, d), "user_id", "ts", "value", "event_id",
        horizonSec = 86400L, z = 1.5, minN = 5)),

    // triangle counting over the part co-order graph — degree-ordered
    // orientation bounds wedge generation at O(m^1.5) (a hub's oriented
    // out-degree is √-bounded), every step an explicit-key hash join
    "g_triangles" -> ((s, d) => {
      val li = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
      val edges = li.as("a")
        .join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      graft.ops.Triangles.triangleCount(edges, "src", "dst")
    }),
      // emit each co-order pair once (a < b) — the operator canonicalizes
      // anyway, so the strict inequality just halves the pre-distinct volume

    // fact × fact interval-overlap join — grid-cell equi-join (both sides
    // shuffle by time cell, no broadcast-nested-loop), duplicate pairs
    // suppressed arithmetically by the first-overlap-cell-owns-the-pair
    // rule instead of a post-join DISTINCT
    "j13_interval_overlap" -> ((s, d) => {
      val start = unix_timestamp(date_trunc("second", col("ts")))
      val dur = greatest(lit(1L), floor(col("value") * 10).cast("long"))
      val iv = Tables.events(s, d)
        .select(col("event_id"), start.as("st"), (start + dur).as("en"))
      graft.ops.IntervalJoin.overlapPairs(
        iv.filter(col("event_id") % 2 === 0), iv.filter(col("event_id") % 2 === 1),
        "event_id", "st", "en", "event_id", "st", "en", bucketWidth = 600L)
        .groupBy("a_id").agg(count(lit(1)).as("n_overlap"))
    }),

    // fixed-point PageRank (3 damped iterations) over the part co-order
    // graph — the Pregel iterated-join pattern with ALL arithmetic in e12
    // scaled integers, so the scores hash-match the oracle's unrolled CTEs
    "g_pagerank3" -> ((s, d) => {
      val li = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
      val edges = li.as("a")
        .join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") =!= col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
      graft.ops.PageRank.fixedPoint(edges, "src", "dst", iters = 3)
    }),

    // bounded-depth BFS over the same co-order graph: min hop distance
    // from a deterministic seed set — the reachability/"blast radius"
    // query; exact integer distances min-merge partition-invariantly,
    // and the oracle unrolls the identical rounds as CTEs
    "g_bfs_dist" -> ((s, d) => {
      val li = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
      val edges = li.as("a")
        .join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") =!= col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
      val seeds = t(s, d, "part")
        .filter(pmod(col("p_partkey"), lit(97L)) === 0L)
        .select(col("p_partkey"))
      graft.ops.Bfs.kHopDistances(edges, "src", "dst", seeds, "p_partkey", maxHops = 3)
    }),

    // Cramér's V association between two categoricals — the normalized
    // [0,1] companion of the chi² gate; marginals and distinct counts
    // ride windows over the |cells|-sized contingency table
    "a18_cramers_v" -> ((s, d) =>
      graft.ml.FeatureScoring.cramersV(
        t(s, d, "orders"), "o_orderpriority", "o_orderstatus")),

    // deterministic source-interleaved training order (curriculum mixing):
    // per-source rank on the portable hash, then a global (rank, source)
    // order — round-robin across sources by construction. BOTH rankings
    // ride GlobalRowNumber; the per-source rank falls out of the global
    // (source, hash) numbering minus broadcast per-source offsets — no
    // per-source window partition (a dominant source would skew it)
    "o15_interleave" -> ((s, d) => {
      val docs = t(s, d, "documents").select(
        col("doc_id"), col("source"),
        permilleHash1M(col("doc_id"), ":il4").as("_h"))
      val g1 = graft.ops.GlobalRowNumber.withRowNumber(
        docs, "_grn", col("source"), col("_h"), col("doc_id"))
      val offs = g1.groupBy("source").agg((min(col("_grn")) - 1L).as("_off"))
      val ranked = g1.join(broadcast(offs), "source")
        .withColumn("rn", col("_grn") - col("_off"))
        .select("doc_id", "source", "rn")
      graft.ops.GlobalRowNumber.withRowNumber(
          ranked, "seq", col("rn"), col("source"), col("doc_id"))
        .select("doc_id", "source", "rn", "seq")
    }),

    // touch→conversion latency per channel: the same one-window-pass
    // attribution machinery, collapsed to per-channel count / exact mean /
    // exact interpolated p50+p90 (a10_quantiles parity contract)
    "ev_time_to_convert" -> ((s, d) =>
      graft.ops.FunnelOps.timeToConvert(
        Tables.events(s, d), "user_id", "event_type", "ts", "event_id",
        touchTypes = Seq("view", "click", "signup"), convType = "purchase",
        lookbackSec = 7L * 86400L)),

    // KMV mergeability as data: per-shard k-min sets union + re-truncate
    // to the SAME k-th minimum as the whole stream — the property that
    // lets executors sketch shards and the reduce combine k-sized sets
    "sk_kmv_merge" -> ((s, d) =>
      graft.sketch.Sketches.kmvMerge(t(s, d, "orders"), "o_custkey")),

    // quantile member of the sketch family: 256-cell equi-width histogram,
    // p50/p90/p99 estimates emitted NEXT TO the exact order statistics
    // (error is data, not a claim); exact side rides the RunningTotal CDF
    "sk_hist_quantiles" -> ((s, d) =>
      graft.sketch.Sketches.histQuantiles(
        t(s, d, "orders"), "o_totalprice", buckets = 256,
        psPermille = Seq(500, 900, 990))),

    // histogram merge linearity: per-shard histograms over the shared
    // grid sum cell-wise to the whole-stream build (n_mismatch = 0) —
    // the property that lets executors histogram shards independently
    "sk_hist_merge" -> ((s, d) =>
      graft.sketch.Sketches.histMergeCheck(
        t(s, d, "orders"), "o_totalprice",
        pmod(col("o_orderkey"), lit(8L)), buckets = 256)),

    // KMV set-INTERSECTION estimate ("users in both segments") — two
    // k-min sketches, union re-truncate, ρ·D̂(U); only k-row frames ever
    // meet, the raw sets never co-shuffle. Estimate emitted beside the
    // exact intersection so the error is data, not a claim
    "sk_kmv_intersect" -> ((s, d) => {
      val o = t(s, d, "orders")
      graft.sketch.Sketches.kmvIntersect(
        o.filter(col("o_orderstatus") === "O"), "o_custkey",
        o.filter(col("o_orderstatus") === "F"), "o_custkey")
    }),

    // class-balanced training batches: per-label rank via GlobalRowNumber
    // minus broadcast offsets (no per-label window funnel), batch id =
    // (rank−1) mod B — every batch carries an equal slice of each class
    "o16_balanced_batches" -> ((s, d) => {
      val emb = t(s, d, "embeddings").select(
        col("vec_id"), col("label"),
        permilleHash1M(col("vec_id"), ":bb4").as("_h"))
      val g = graft.ops.GlobalRowNumber.withRowNumber(
        emb, "_grn", col("label"), col("_h"), col("vec_id"))
      val offs = g.groupBy("label").agg((min(col("_grn")) - 1L).as("_off"))
      g.join(broadcast(offs), "label")
        .withColumn("batch", pmod(col("_grn") - col("_off") - 1L, lit(8L)))
        .groupBy("batch", "label").agg(count(lit(1)).as("n"))
    }),

    // dynamic partition overwrite: rewrite ONLY the partitions present in
    // the incoming frame (the lakehouse backfill primitive) — 'F' is
    // replaced by a half-sized slice, other partitions must survive
    "s16_dynamic_overwrite" -> ((s, d) => {
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_s16_${new java.io.File(d).getName}"
      val orders = t(s, d, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
      orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(base)
      val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try orders
        .filter(col("o_orderstatus") === "F" &&
          permilleHash(col("o_orderkey"), ":dow4") < 500)
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(base)
      finally prev match {
        case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      s.read.parquet(base)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
    }),

    // dynamic two-phase pivot: distinct pivot values discovered at runtime
    // (one k-row job), then the same one-pass pivot aggregate — the
    // pattern for pivoting a column whose domain isn't known upfront
    "p15_dynamic_pivot" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val vals = orders.select("o_orderpriority").distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", vals)
        .agg(count(lit(1)))
        .na.fill(0L)
    }),

    // 2-D Pareto frontier: customers no other customer beats on BOTH total
    // spend and order count — bucket-chain skyline (hash exchange + B-row
    // broadcast), never a self θ-join or single-reducer sort
    "a21_skyline" -> ((s, d) => {
      val agg = t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
          .as("spend_cents"),
          count(lit(1)).as("n_orders"))
      graft.ops.Skyline.frontier2D(agg, "spend_cents", "n_orders",
        keep = Seq("o_custkey"), bucketWidth = 1000000L)
    }),

    // frequent co-ordered part pairs (market-basket support counts): the
    // self-join is co-partitioned on the order key and baskets are
    // bounded, so pair cardinality is Σ per-order C(items,2), not n²
    "a22_itemsets" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_partkey").as("p")).distinct()
      li.as("a").join(li.as("b"),
          col("a.k") === col("b.k") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("part_a"), col("b.p").as("part_b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
    }),

    // association RULES on top of the pair supports: both directions per
    // pair, confidence = supp(ab)/supp(a), lift = conf/(supp(b)/N) — the
    // market-basket readout. Item supports and the basket count broadcast
    // onto the (already-small) pair table; nothing re-scans the baskets
    "a23_assoc_rules" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_partkey").as("p")).distinct()
      val itemSupp = li.groupBy(col("p")).agg(count(lit(1)).as("supp"))
      val nBaskets = li.select("k").distinct().agg(count(lit(1)).as("n_baskets"))
      val pairs = li.as("a").join(li.as("b"),
          col("a.k") === col("b.k") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
        .agg(count(lit(1)).as("supp_ab"))
        .filter(col("supp_ab") >= 2)
      val rules = pairs.select(col("pa").as("antecedent"), col("pb").as("consequent"), col("supp_ab"))
        .unionByName(pairs.select(col("pb").as("antecedent"), col("pa").as("consequent"), col("supp_ab")))
      rules
        .join(broadcast(itemSupp).withColumnRenamed("p", "antecedent")
          .withColumnRenamed("supp", "supp_a"), "antecedent")
        .join(broadcast(itemSupp).withColumnRenamed("p", "consequent")
          .withColumnRenamed("supp", "supp_b"), "consequent")
        .crossJoin(broadcast(nBaskets))
        .select(
          col("antecedent"), col("consequent"), col("supp_ab"),
          round(col("supp_ab").cast("double") / col("supp_a"), 6).as("confidence"),
          round((col("supp_ab").cast("double") / col("supp_a")) /
            (col("supp_b").cast("double") / col("n_baskets")), 6).as("lift"))
    }),

    // per-source contribution quota (crawl-style capping): keep at most k
    // docs per source in deterministic hash order — rides the native
    // bounded-heap TopKPerKey operator, not a full per-source sort
    "o17_source_quota" -> ((s, d) => {
      val docs = t(s, d, "documents").select(
        col("doc_id"), col("source"),
        permilleHash1M(col("doc_id"), ":qta4").as("_h"))
      graft.plans.TopKPerKey(docs, Seq("source"),
          Seq(col("_h").asc, col("doc_id").asc), 10)
        .select("source", "doc_id")
    }),

    // sorted-neighborhood blocking (merge/purge): global order by a text
    // prefix key via GlobalRowNumber, compare each doc to its w−1
    // successors — the deterministic-recall counterpart to LSH
    "d_sorted_neighbors" -> ((s, d) =>
      graft.dedup.Dedup.sortedNeighborPairs(
        t(s, d, "documents"), "doc_id", "text",
        window = 4, keyLen = 12, threshold = 0.2)),

    // Fellegi–Sunter record linkage with known truth: customers linked to
    // a hash-perturbed twin (case-typo'd name / shifted balance / lost
    // segment), blocked on the stable name-digit fragment (≈100-member
    // blocks at ANY scale — candidates grow linearly with data, never
    // quadratically), integer agreement weights summed per pair; the
    // (score, n_pairs, n_true) distribution is the threshold curve
    "er_link_scores" -> ((s, d) => {
      import graft.dedup.RecordLinkage
      import graft.dedup.RecordLinkage.FieldRule
      val cust = t(s, d, "customer")
      val blk = substring(col("c_name"), 10, 7)
      val a = cust.withColumn("blk", blk)
      val b = cust.select(
          col("c_custkey"),
          when(permilleHash(col("c_custkey"), ":erN") < 300,
            concat(lit("customer"), substring(col("c_name"), 9, 1000)))
            .otherwise(col("c_name")).as("c_name"),
          when(permilleHash(col("c_custkey"), ":erB") < 250,
            col("c_acctbal") + 10.0).otherwise(col("c_acctbal")).as("c_acctbal"),
          when(permilleHash(col("c_custkey"), ":erS") < 200, lit("UNKNOWN"))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"))
        .withColumn("blk", blk)
      val rules = Seq(
        FieldRule("c_name", (x, y) => x === y, wAgree = 3L, wDisagree = 1L),
        FieldRule("c_acctbal", (x, y) => abs(x - y) <= 0.005, wAgree = 2L, wDisagree = 2L),
        FieldRule("c_mktsegment", (x, y) => x === y, wAgree = 1L, wDisagree = 1L))
      RecordLinkage.scoreDistribution(
        RecordLinkage.scorePairs(a, b, "c_custkey", Seq("blk"), rules))
    }),

    // STREAM-STREAM FULL OUTER drain: inner pairs + watermark-evicted
    // unmatched rows from BOTH sides — the two-sided outer state machine,
    // pinned by a batch oracle carrying both eviction predicates
    "ev_stream_full" -> ((s, d) =>
      graft.streaming.StreamOps
        .streamStreamFullOuter(s, d, "graft_ev_stream_full")
        .groupBy(coalesce(col("v_user"), col("c_user")).as("user_id"))
        .agg(
          count(when(col("v_id").isNotNull && col("c_id").isNotNull, 1)).as("n_pairs"),
          sum(when(col("c_id").isNull, 1L).otherwise(0L)).as("n_unmatched_v"),
          sum(when(col("v_id").isNull, 1L).otherwise(0L)).as("n_unmatched_c"))),

    // exact higher moments per group: all four raw power sums accumulate
    // in integer-cent decimals (one hash-agg), the normalized skewness /
    // kurtosis formulas run scalar double math in fixed op order
    // exact 10% trimmed mean per status — robust location from one window
    // pass + one grouped decimal mean; trim membership deterministic via
    // the unique o_orderkey tiebreak
    "a24_trimmed_mean" -> ((s, d) =>
      graft.ops.RobustStats.trimmedMean(
        t(s, d, "orders"), Seq("o_orderstatus"), "o_totalprice",
        "o_orderkey", trim = 0.1)),

    "a20_moments" -> ((s, d) => {
      val c = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("decimal(12,0)")
      val agg = t(s, d, "orders")
        .select(col("o_orderstatus"), c.as("_c"),
          (c * c).as("_c2"))
        .withColumn("_c3", col("_c2") * col("_c"))
        .withColumn("_c4", col("_c3") * col("_c"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum("_c").as("_s1"), sum("_c2").as("_s2"),
          sum("_c3").as("_s3"), sum("_c4").as("_s4"))
      def dd(s: String) = col(s).cast("double")
      val n = dd("n"); val s1 = dd("_s1"); val s2 = dd("_s2")
      val s3 = dd("_s3"); val s4 = dd("_s4")
      val m = s1 / n
      val v = s2 / n - m * m
      agg.select(col("o_orderstatus"), col("n"),
        when(v <= 0.0, lit(0.0)).otherwise(round(
          (s3 / n - lit(3.0) * m * (s2 / n) + lit(2.0) * m * m * m) /
            (v * sqrt(v)), 6)).as("skewness"),
        when(v <= 0.0, lit(0.0)).otherwise(round(
          (s4 / n - lit(4.0) * m * (s3 / n) + lit(6.0) * m * m * (s2 / n) -
            lit(3.0) * m * m * m * m) / (v * v) - lit(3.0), 6)).as("kurtosis"))
    }),

    // degree distribution of the co-order part graph — the "is this graph
    // power-law / is one hub a skew bomb" readout before any graph op
    // connected components over a hash-sparsified co-order graph: the
    // dupClusters min-label propagation applied as a graph op, readout =
    // component size histogram; every part is labeled (singletons are
    // their own component). The 3‰ edge sample keeps mean degree ≈ 0.3 —
    // firmly SUBCRITICAL, so components (and the propagation's diameter,
    // and the oracle's recursive closure) stay small at ANY scale; a
    // near-critical sample (tried at 1%) grows a giant component whose
    // diameter scales like n^(2/3) and label propagation with it
    // k-core peeling over the (5%-sampled) co-order graph: the graph-
    // mutating fixpoint (PageRank iterates values, components iterate
    // labels — the peel iterates the GRAPH), 3 unrolled rounds at k=6;
    // each round = one degree hash-agg + two node-keyed trims
    "g_kcore" -> ((s, d) => {
      val li = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
      val edges = li.as("a")
        .join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .filter(permilleHash(
          concat(col("src").cast("string"), lit(":"), col("dst").cast("string")),
          ":kcore") < 50)
        .distinct()
      graft.ops.KCore.peel(edges, k = 6, rounds = 3)
    }),

    "g_components" -> ((s, d) => {
      val li = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
      val pairs = li.as("a")
        .join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("doc_a"), col("b.l_partkey").as("doc_b"))
        .filter(permilleHash(
          concat(col("doc_a").cast("string"), lit(":"), col("doc_b").cast("string")),
          ":gcc") < 3)
        .distinct()
      val nodes = t(s, d, "part").select(col("p_partkey"))
      Dedup.dupClusters(pairs, nodes, "p_partkey")
        .groupBy("rep_id").agg(count(lit(1)).as("sz"))
        .groupBy("sz").agg(count(lit(1)).as("n_components"))
    }),

    "g_degree_dist" -> ((s, d) => {
      val li = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
      val edges = li.as("a")
        .join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
      edges.select(col("src").as("node"))
        .unionAll(edges.select(col("dst").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
    }),


    // order-invariant table content fingerprint: canonical row rendering →
    // portable 60-bit hash → commutative combine (exact decimal SUM +
    // bitwise XOR + count). Cross-copy/cross-engine data equality from ONE
    // scan and three scalars — the oracle recomputing the same fingerprint
    // from the same parquet IS the cross-engine check
    "dq_table_checksum" -> ((s, d) =>
      graft.ops.TableChecksum.checksum(
        t(s, d, "orders"),
        Seq(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,2)"),
          col("o_orderdate").cast("date"), col("o_orderpriority")))),

    // the WRITE-path twin of dq_table_checksum: rows flow through the
    // custom DSv2 ChecksumSink, whose two-phase commit merges per-task
    // (count, exact-sum, xor) triples — the committed fingerprint must
    // equal the query-path checksum, pinned by the IDENTICAL oracle
    "s18_checksum_sink" -> ((s, d) => {
      val cols = Seq(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)"),
        col("o_orderdate").cast("date"), col("o_orderpriority"))
      t(s, d, "orders")
        .select(graft.ops.TableChecksum.rowHash(cols).as("_h"))
        .write.format("graft.sources.ChecksumSink")
        .option("key", "s18").mode("append").save()
      val (n, sum, x) = graft.sources.ChecksumSink.result("s18").get
      import s.implicits._
      Seq((n, sum.toString, x)).toDF("n_rows", "hash_sum", "hash_xor")
    }),

    // pipeline-health freshness: per-type last-arrival lag vs the global
    // max — the "is a source stalled" monitoring readout; one hash-agg,
    // one window over the |types|-sized result
    "dq_freshness" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          unix_timestamp(date_trunc("second", col("ts"))).as("_sec"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), max("_sec").as("last_sec"))
        .withColumn("staleness_sec",
          max(col("last_sec")).over(Window.partitionBy()) - col("last_sec"))),

    // LINEAR multi-touch attribution: per-channel + total in-window touch
    // counts from RANGE-frame windows sharing ONE user exchange (no
    // conversions×touches join); integer ppm credits keep the sums exact
    "ev_attribution_linear" -> ((s, d) =>
      graft.ops.FunnelOps.linearAttribution(
        Tables.events(s, d), "user_id", "event_type", "ts",
        touchTypes = Seq("view", "click", "signup"), convType = "purchase",
        lookbackSec = 7L * 86400L)),

    // U-shaped attribution completes the family: 40/20/40 first/middle/
    // last, first+last resolved via tie-safe encoded MIN/MAX in the SAME
    // single window pass — still no touch×conversion join
    "ev_attribution_position" -> ((s, d) =>
      graft.ops.FunnelOps.positionAttribution(
        Tables.events(s, d), "user_id", "event_type", "ts", "event_id",
        touchTypes = Seq("view", "click", "signup"), convType = "purchase",
        lookbackSec = 7L * 86400L)),

    // gap-based sessions through Spark's NATIVE session_window operator
    // (merging-session state machine, batch form) — oracled against the
    // explicit lag/running-sum session reconstruction
    "ev_session_native" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("ts2", date_trunc("second", col("ts")))
        .groupBy(col("user_id"), session_window(col("ts2"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"))),

    // web-crawl curation: URL extraction (regexp_extract_all) → host
    // normalization (lowercase, strip www.) → per-domain link/doc counts;
    // injection is deterministic so both engines see identical text
    "t_url_hosts" -> ((s, d) => {
      val id = col("doc_id")
      val host = concat(
        when(id % 2 === 0, lit("WWW.")).otherwise(lit("")),
        lit("site"), pmod(id, lit(7)).cast("string"),
        lit(".example"), when(id % 3 === 0, lit(".org")).otherwise(lit(".com")))
      val injected = concat(col("text"),
        when(id % 4 === 0,
          concat(lit(" see https://"), host, lit("/p/"), id.cast("string")))
          .otherwise(lit("")),
        when(id % 6 === 0, concat(lit(" also http://"), host, lit("/q")))
          .otherwise(lit("")))
      Tables.documents(s, d)
        .withColumn("inj", injected)
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(inj, 'https?://([A-Za-z0-9.-]+)', 1)"))
            .as("raw"))
        .select(col("doc_id"),
          regexp_replace(lower(col("raw")), "^www\\.", "").as("host"))
        .groupBy("host")
        .agg(count(lit(1)).as("n_links"), countDistinct(col("doc_id")).as("n_docs"))
    }),

    // Q12-shaped late-shipment severity split through the shared-text tier
    "sql_q12_late" -> ((s, d) => {
      Seq("orders", "lineitem").foreach(tn =>
        Tables.table(s, d, tn).createOrReplaceTempView(tn))
      s.sql(Shared.q12Sql)
    }),

    // Q14-shaped promo revenue share (join + conditional decimal ratio)
    "sql_q14_promo" -> ((s, d) => {
      Seq("lineitem", "part").foreach(tn =>
        Tables.table(s, d, tn).createOrReplaceTempView(tn))
      s.sql(Shared.q14Sql)
    }),

    // Q19 shape: OR'd conjunct groups referencing both join sides — the
    // disjunction evaluates post-join; Catalyst still extracts the
    // common p_brand IN (…) implication for the part-side scan
    "sql_q19_parts" -> ((s, d) => {
      Seq("lineitem", "part").foreach(tn =>
        Tables.table(s, d, tn).createOrReplaceTempView(tn))
      s.sql(Shared.q19Sql)
    }),

    // the four partsupp decision-support shapes (Q2/Q11/Q16/Q20), over
    // the deterministically DERIVED partsupp (see partsuppCte — the one
    // TPC-H table the testdata lacks). Shared text: the same SQL string
    // runs on Spark and DuckDB, so the derivation AND the query are both
    // cross-engine-checked.
    "sql_q2_mincost" -> ((s, d) => {
      Seq("part", "supplier", "nation", "region").foreach(tn =>
        Tables.table(s, d, tn).createOrReplaceTempView(tn))
      s.sql(Shared.q2Sql)
    }),
    "sql_q11_stockvalue" -> ((s, d) => {
      Seq("part", "supplier", "nation").foreach(tn =>
        Tables.table(s, d, tn).createOrReplaceTempView(tn))
      s.sql(Shared.q11Sql)
    }),
    "sql_q16_suppcnt" -> ((s, d) => {
      Seq("part", "supplier").foreach(tn =>
        Tables.table(s, d, tn).createOrReplaceTempView(tn))
      s.sql(Shared.q16Sql)
    }),
    "sql_q20_excess" -> ((s, d) => {
      Seq("part", "supplier", "nation", "lineitem").foreach(tn =>
        Tables.table(s, d, tn).createOrReplaceTempView(tn))
      s.sql(Shared.q20Sql)
    }),
  )

  val oracles: Seq[(String, String)] = Seq(
    "ev_anomaly" -> graft.ops.TimeSeriesOps.rollingAnomalyOracleSql(
      "events", "user_id", "ts", "value", "event_id",
      horizonSec = 86400L, z = 1.5, minN = 5),

    "o20_domain_mix" -> graft.ops.DomainMix.mixCountsOracleSql(
      "documents", "lang", "doc_id",
      permilleHashSql("doc_id", ":mix", 1000000L),
      Map("en" -> 0.4, "de" -> 0.15, "es" -> 0.15,
        "fr" -> 0.15, "zh" -> 0.15)),

    "o21_temp_mix" -> graft.ops.DomainMix.temperatureMixOracleSql(
      "documents", "lang", "doc_id",
      permilleHashSql("doc_id", ":mix", 1000000L)),

    "scd2_merge" ->
      s"""WITH snaps AS (
         |  SELECT o_orderkey, o_orderdate AS ts, o_orderstatus FROM orders
         |  UNION ALL
         |  SELECT o_orderkey, o_orderdate + INTERVAL 30 DAY, 'X' FROM orders
         |  WHERE (${permilleHashSql("o_orderkey", ":up42", 1000)}) < 100
         |  UNION ALL
         |  SELECT o_orderkey, o_orderdate + INTERVAL 60 DAY, o_orderstatus FROM orders
         |  WHERE (${permilleHashSql("o_orderkey", ":up42", 1000)}) >= 100
         |    AND (${permilleHashSql("o_orderkey", ":up42", 1000)}) < 200
         |), flagged AS (
         |  SELECT o_orderkey, ts, o_orderstatus,
         |         lag(ts) OVER w IS NULL AS first_row,
         |         o_orderstatus IS DISTINCT FROM lag(o_orderstatus) OVER w AS chg
         |  FROM snaps WINDOW w AS (PARTITION BY o_orderkey ORDER BY ts)
         |), kept AS (
         |  SELECT o_orderkey, ts, o_orderstatus FROM flagged WHERE first_row OR chg
         |)
         |SELECT o_orderkey, o_orderstatus, ts AS valid_from,
         |       lead(ts) OVER w2 AS valid_to,
         |       lead(ts) OVER w2 IS NULL AS is_current
         |FROM kept WINDOW w2 AS (PARTITION BY o_orderkey ORDER BY ts)""".stripMargin,

    "merge_upsert" ->
      s"""WITH snaps AS (
         |  SELECT o_orderkey, o_orderdate AS ts, o_orderstatus FROM orders
         |  UNION ALL
         |  SELECT o_orderkey, o_orderdate + INTERVAL 30 DAY, 'X' FROM orders
         |  WHERE (${permilleHashSql("o_orderkey", ":up42", 1000)}) < 100
         |), r AS (
         |  SELECT o_orderstatus,
         |         row_number() OVER (PARTITION BY o_orderkey
         |                            ORDER BY ts DESC, o_orderstatus DESC) AS rn
         |  FROM snaps
         |)
         |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM r WHERE rn = 1 GROUP BY 1""".stripMargin,

    // the compacted copy must aggregate exactly like the source slice
    "s13_compact_roundtrip" ->
      s"""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         |FROM orders
         |WHERE (${permilleHashSql("o_orderkey", ":cp42", 1000)}) < 200
         |GROUP BY 1""".stripMargin,

    // gen-1 rows (hash < 500) have no price column after evolution →
    // n_legacy counts exactly those; sum_price covers gen-2 rows only
    "s15_schema_evolution" ->
      s"""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       CAST(SUM(CASE WHEN ${permilleHashSql("o_orderkey", ":se42", 1000)} < 500
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_legacy,
         |       CAST(SUM(CASE WHEN ${permilleHashSql("o_orderkey", ":se42", 1000)} >= 500
         |                     THEN CAST(o_totalprice AS DECIMAL(18,2))
         |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_price
         |FROM orders
         |GROUP BY 1""".stripMargin,

    "a16_weighted_quantiles" ->
      graft.ops.WeightedStats.weightedQuantilesOracleSql(
        "lineitem", "l_extendedprice", "l_quantity", Seq(250, 500, 750, 900)),

    "fe_quantile_match" ->
      graft.ops.QuantileMatch.matchQuantilesOracleSql(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'",
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'",
        "o_orderkey", "o_totalprice"),

    // per-bigram log-probs are micro-scaled to integers BEFORE the per-doc
    // sum, so the mean is order-independent on both engines
    "t_bigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS t
        |  FROM documents
        |), uni AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c1
        |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
        |), v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v_size FROM uni),
        |bg AS (
        |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        |  FROM toks, unnest(range(1, len(t))) AS r(i)
        |), bc AS (
        |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2
        |)
        |SELECT bg.doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(CASE WHEN bc.c2 >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        |  round(CAST(SUM(CAST(round(ln(CAST(bc.c2 + 1 AS DOUBLE) / (uni.c1 + v.v_size)) * 1e6) AS BIGINT)) AS DOUBLE)
        |        / (COUNT(*) * 1e6), 6) AS avg_lp
        |FROM bg JOIN bc ON bg.w1 = bc.w1 AND bg.w2 = bc.w2
        |        JOIN uni ON bg.w1 = uni.w
        |        CROSS JOIN v
        |GROUP BY bg.doc_id""".stripMargin,

    "t_kn_bigram" ->
      graft.text.BigramLm.kneserNeyOracleSql("documents", "text", topK = 50),

    // moment sums are exact decimals; the one floating-point formula at
    // the end is identical rational+sqrt arithmetic in both engines
    "a11_corr" ->
      """WITH m AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s_q,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s_e,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s_d,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS ss_q,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS ss_e,
        |    CAST(SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS ss_d,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sp_qe,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sp_qd,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sp_ed
        |  FROM lineitem
        |)
        |SELECT 'l_quantity' AS x, 'l_extendedprice' AS y,
        |       round((n * sp_qe - s_q * s_e) / sqrt((n * ss_q - s_q * s_q) * (n * ss_e - s_e * s_e)), 9) AS corr FROM m
        |UNION ALL
        |SELECT 'l_quantity', 'l_discount',
        |       round((n * sp_qd - s_q * s_d) / sqrt((n * ss_q - s_q * s_q) * (n * ss_d - s_d * s_d)), 9) FROM m
        |UNION ALL
        |SELECT 'l_extendedprice', 'l_discount',
        |       round((n * sp_ed - s_e * s_d) / sqrt((n * ss_e - s_e * s_e) * (n * ss_d - s_d * s_d)), 9) FROM m""".stripMargin,

    "a12_ols_group" -> graft.ops.RegressionOps.olsByGroupOracleSql(
      "lineitem", Seq("l_returnflag"), "l_quantity", "l_extendedprice"),

    "fe_mad_outliers" -> graft.ops.RobustStats.madOutliersOracleSql(
      "orders", Seq("o_orderstatus"), "o_totalprice", k = 3.0),

    "fe_quantile_bin" -> graft.ops.RobustStats.quantileBinsOracleSql(
      "orders", "o_totalprice", (1 to 9).map(_ / 10.0)),

    "fe_binned_woe" -> graft.ml.TargetEncoding.woeBinnedOracleSql(
      "orders", "o_totalprice", "o_orderstatus = 'F'", (1 to 9).map(_ / 10.0)),

    "fe_rfm" ->
      """WITH per AS (
        |  SELECT o_custkey, MAX(o_orderdate) AS last_order,
        |         count(*) AS frequency,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |  FROM orders GROUP BY 1
        |), r AS (
        |  SELECT o_custkey,
        |         date_diff('day', last_order, DATE '1998-08-02') AS recency,
        |         frequency, monetary
        |  FROM per
        |)
        |SELECT o_custkey, recency, frequency, monetary,
        |  ntile(5) OVER (ORDER BY recency ASC, o_custkey ASC) AS r_score,
        |  ntile(5) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_score,
        |  ntile(5) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_score
        |FROM r""".stripMargin,

    "a15_pareto_abc" ->
      """WITH per AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY 1
        |), c AS (
        |  SELECT o_custkey, spend,
        |         SUM(spend) OVER (ORDER BY spend DESC, o_custkey ASC
        |                          ROWS UNBOUNDED PRECEDING) AS cum,
        |         SUM(spend) OVER () AS tot
        |  FROM per
        |)
        |SELECT CASE WHEN cum * 20 <= tot * 16 THEN 'A'
        |            WHEN cum * 20 <= tot * 19 THEN 'B'
        |            ELSE 'C' END AS abc_class,
        |       count(*) AS n_customers, CAST(SUM(spend) AS DOUBLE) AS class_spend
        |FROM c GROUP BY 1""".stripMargin,

    "fe_lag_features" -> graft.ops.TimeSeriesOps.lagFeaturesOracleSql(
      "events", "user_id", "ts", "value", Seq(1, 2)),

    "ev_streaks" -> graft.ops.TimeSeriesOps.activityStreaksOracleSql(
      "events", "user_id", "ts"),

    "ts_acf" -> graft.ops.TimeSeriesOps.autocorrOracleSql(
      "events", "event_type", "ts", "value", maxLag = 3),

    "ts_cusum" -> graft.ops.TimeSeriesOps.cusumOracleSql(
      "events", "event_type", "ts", "value"),

    "o18_priority_sample" -> graft.ops.PrioritySampling.oracleSql(
      "documents", "doc_id", "n_chars", k = 500),

    "ts_seasonal_dow" ->
      graft.ops.TimeSeriesOps.seasonalDowOracleSql("events", "ts"),

    "ts_backtest_naive" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         SUM(CAST(value AS DECIMAL(18,2))) AS v
        |  FROM events GROUP BY 1, 2
        |), j AS (
        |  SELECT d.event_type, d.v, p.v AS pv
        |  FROM daily d JOIN daily p
        |    ON d.event_type = p.event_type AND p.day = d.day - 7
        |  WHERE d.v > 0
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |       round(CAST(SUM(abs(v - pv)) AS DOUBLE) / count(*), 6) AS mae,
        |       round(CAST(SUM(CAST(round(abs(CAST(v - pv AS DOUBLE)) / CAST(v AS DOUBLE) * 1e9) AS BIGINT)) AS DOUBLE)
        |             / count(*) / 1e9, 9) AS mape
        |FROM j GROUP BY 1""".stripMargin,

    "sk_kmv_intersect" -> graft.sketch.Sketches.kmvIntersectOracleSql(
      "SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'",
      "SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'"),

    "dp_profile" -> graft.ops.Profiler.oracleSql(
      "lineitem",
      numericCols = Seq("l_quantity", "l_extendedprice", "l_discount"),
      stringCols = Seq("l_returnflag", "l_linestatus")),

    "t_bm25" -> graft.text.Bm25.oracleSql(
      "documents", "doc_id", "text", Seq("join", "window", "stream", "vector")),

    "ev_peak_concurrency" -> graft.ops.SweepLine.peakConcurrencyOracleSql(
      "events",
      startSql = "CAST(epoch(date_trunc('second', ts)) AS BIGINT)",
      endSql = "CAST(epoch(date_trunc('second', ts)) AS BIGINT) + " +
        "GREATEST(1, CAST(FLOOR(value * 10) AS BIGINT))"),

    "ev_rolling24h" -> graft.ops.TimeSeriesOps.rollingAggOracleSql(
      "events", "user_id", "ts", "value", "event_id", 86400L),

    "ev_gapfill_daily" -> graft.ops.TimeSeriesOps.gapFillDailyOracleSql(
      "events", "user_id", "ts", "value"),

    "ev_cum_uniques" -> graft.ops.TimeSeriesOps.cumulativeUniquesOracleSql(
      "events", "user_id", "ts"),

    "ev_rolling_wau" -> graft.ops.TimeSeriesOps.rollingActiveUsersOracleSql(
      "events", "user_id", "ts", windowDays = 7),

    "ev_churn_cohorts" ->
      """WITH per AS (
        |  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day,
        |         MAX(CAST(ts AS DATE)) AS last_day
        |  FROM events GROUP BY 1
        |), h AS (
        |  SELECT *, MAX(last_day) OVER () - 7 AS horizon FROM per
        |)
        |SELECT CAST(date_trunc('week', first_day) AS DATE) AS cohort_week,
        |       count(*) AS n_users,
        |       CAST(SUM(CASE WHEN last_day < horizon THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
        |FROM h GROUP BY 1""".stripMargin,

    "ev_stickiness" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), dau AS (
        |  SELECT day, count(*) AS dau FROM active GROUP BY 1
        |), vis AS (
        |  SELECT user_id, CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
        |           CAST(day AS TIMESTAMP) + INTERVAL 27 DAY,
        |           INTERVAL 1 DAY)) AS DATE) AS day2
        |  FROM active
        |), mau AS (
        |  SELECT day2 AS day, count(DISTINCT user_id) AS mau FROM vis GROUP BY 1
        |)
        |SELECT d.day, d.dau, m.mau,
        |       round(CAST(d.dau AS DOUBLE) / m.mau, 6) AS stickiness
        |FROM dau d JOIN mau m ON d.day = m.day""".stripMargin,

    "g_pagerank3" -> graft.ops.PageRank.fixedPointOracleSql(
      "SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst " +
        "FROM lineitem a JOIN lineitem b " +
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey",
      iters = 3),

    "g_bfs_dist" -> graft.ops.Bfs.kHopOracleSql(
      "SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst " +
        "FROM lineitem a JOIN lineitem b " +
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey",
      "SELECT p_partkey AS node FROM part WHERE p_partkey % 97 = 0",
      maxHops = 3),

    // the maintenance identity: snapshot ⊕ delta == aggregate(base ⊖ D ⊕ I)
    "inc_agg_maintain" ->
      s"""WITH del AS (
         |  SELECT o_orderkey FROM orders
         |  WHERE ${permilleHashSql("o_orderkey", ":inc42", 1000L)} < 50
         |), ins AS (
         |  SELECT o_orderstatus, o_totalprice + 1000.0 AS o_totalprice FROM orders
         |  WHERE ${permilleHashSql("o_orderkey", ":inc42", 1000L)} >= 950
         |), live AS (
         |  SELECT o_orderstatus, o_totalprice FROM orders
         |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del)
         |  UNION ALL SELECT * FROM ins
         |)
         |SELECT o_orderstatus, count(*) AS cnt,
         |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         |FROM live GROUP BY 1""".stripMargin,

    // recompute of the maintained join over the MODIFIED base tables —
    // the IVM identity the Spark side must hit bit-for-bit
    "inc_join_maintain" ->
      s"""WITH a AS (
         |  SELECT o_custkey, o_totalprice FROM orders
         |  WHERE NOT (${permilleHashSql("o_orderkey", ":ijm", 1000L)} < 50)
         |  UNION ALL
         |  SELECT o_custkey, o_totalprice + 1000.0 FROM orders
         |  WHERE ${permilleHashSql("o_orderkey", ":ijm", 1000L)} >= 950
         |), b AS (
         |  SELECT c_custkey, c_nationkey FROM customer
         |  WHERE NOT (${permilleHashSql("c_custkey", ":ijmc", 1000L)} < 30)
         |)
         |SELECT b.c_nationkey, count(*) AS cnt,
         |       CAST(CAST(SUM(CAST(a.o_totalprice AS DECIMAL(18,2)))
         |            AS DECIMAL(18,2)) AS DOUBLE) AS sum_v
         |FROM a JOIN b ON a.o_custkey = b.c_custkey
         |GROUP BY 1""".stripMargin,

    "dq_table_checksum" -> graft.ops.TableChecksum.checksumOracleSql(
      "orders",
      Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "CAST(o_totalprice AS DECIMAL(18,2))",
        "CAST(o_orderdate AS DATE)", "o_orderpriority")),

    // identical oracle text as dq_table_checksum — the sink's committed
    // fingerprint and the query-path aggregate must both hit it
    "s18_checksum_sink" -> graft.ops.TableChecksum.checksumOracleSql(
      "orders",
      Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "CAST(o_totalprice AS DECIMAL(18,2))",
        "CAST(o_orderdate AS DATE)", "o_orderpriority")),

    "ev_time_to_convert" -> graft.ops.FunnelOps.timeToConvertOracleSql(
      "events", "user_id", "event_type", "ts", "event_id",
      touchTypes = Seq("view", "click", "signup"), convType = "purchase",
      lookbackSec = 7L * 86400L),

    "a18_cramers_v" ->
      """WITH joint AS (
        |  SELECT o_orderpriority AS x, o_orderstatus AS y, CAST(count(*) AS BIGINT) AS nxy
        |  FROM orders GROUP BY 1, 2
        |), m AS (
        |  SELECT *,
        |         SUM(nxy) OVER () AS n,
        |         SUM(nxy) OVER (PARTITION BY x) AS nx,
        |         SUM(nxy) OVER (PARTITION BY y) AS ny
        |  FROM joint
        |), terms AS (
        |  SELECT n,
        |         (nxy - CAST(nx AS DOUBLE) * ny / n) * (nxy - CAST(nx AS DOUBLE) * ny / n)
        |           / (CAST(nx AS DOUBLE) * ny / n) AS term,
        |         CAST(nx AS DOUBLE) * ny / n AS exp,
        |         x, y
        |  FROM m
        |)
        |SELECT round(SUM(term) + (MAX(n) - SUM(exp)), 6) AS chi2_stat,
        |       CAST(MAX(n) AS BIGINT) AS n,
        |       LEAST(COUNT(DISTINCT x) - 1, COUNT(DISTINCT y) - 1) AS df_min,
        |       round(sqrt((SUM(term) + (MAX(n) - SUM(exp))) /
        |             (MAX(n) * LEAST(COUNT(DISTINCT x) - 1, COUNT(DISTINCT y) - 1))), 6)
        |         AS cramers_v
        |FROM terms""".stripMargin,

    "o15_interleave" ->
      s"""WITH h AS (
         |  SELECT doc_id, source,
         |         ${permilleHashSql("doc_id", ":il4", 1000000L)} AS hh
         |  FROM documents
         |), r AS (
         |  SELECT doc_id, source,
         |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rn
         |  FROM h
         |)
         |SELECT doc_id, source, rn,
         |       ROW_NUMBER() OVER (ORDER BY rn, source, doc_id) AS seq
         |FROM r""".stripMargin,

    "sk_kmv_merge" -> graft.sketch.Sketches.kmvMergeOracleSql("o_custkey", "orders"),

    "sk_hist_quantiles" -> graft.sketch.Sketches.histQuantilesOracleSql(
      "orders", "o_totalprice", buckets = 256, psPermille = Seq(500, 900, 990)),

    "sk_hist_merge" -> graft.sketch.Sketches.histMergeCheckOracleSql(
      "orders", "o_totalprice", "o_orderkey % 8", buckets = 256),

    "o16_balanced_batches" ->
      s"""WITH h AS (
         |  SELECT vec_id, label,
         |         ${permilleHashSql("vec_id", ":bb4", 1000000L)} AS hh
         |  FROM embeddings
         |), r AS (
         |  SELECT label,
         |         row_number() OVER (PARTITION BY label ORDER BY hh, vec_id) AS rn
         |  FROM h
         |)
         |SELECT (rn - 1) % 8 AS batch, label, CAST(count(*) AS BIGINT) AS n
         |FROM r GROUP BY 1, 2""".stripMargin,

    "s16_dynamic_overwrite" ->
      s"""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         |FROM orders
         |WHERE o_orderstatus <> 'F'
         |   OR (${permilleHashSql("o_orderkey", ":dow4", 1000)}) < 500
         |GROUP BY 1""".stripMargin,

    "p15_dynamic_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS "1-URGENT",
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS "2-HIGH",
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS "3-MEDIUM",
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS "4-NOT SPECIFIED",
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS "5-LOW"
        |FROM orders GROUP BY 1""".stripMargin,

    "a21_skyline" -> graft.ops.Skyline.frontier2DOracleSql(
      aggCte = """SELECT o_custkey,
                 |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS spend_cents,
                 |  COUNT(*) AS n_orders
                 |FROM orders GROUP BY 1""".stripMargin,
      idSql = "o_custkey", xSql = "spend_cents", ySql = "n_orders"),

    "a22_itemsets" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem)
        |SELECT a.p AS part_a, b.p AS part_b, CAST(count(*) AS BIGINT) AS support
        |FROM li a JOIN li b ON a.k = b.k AND a.p < b.p
        |GROUP BY 1, 2
        |HAVING count(*) >= 2""".stripMargin,

    "a23_assoc_rules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
        |supp AS (SELECT p, CAST(count(*) AS BIGINT) AS supp FROM li GROUP BY 1),
        |nb AS (SELECT CAST(count(DISTINCT k) AS BIGINT) AS n_baskets FROM li),
        |pairs AS (
        |  SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS supp_ab
        |  FROM li a JOIN li b ON a.k = b.k AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |),
        |rules AS (
        |  SELECT pa AS antecedent, pb AS consequent, supp_ab FROM pairs
        |  UNION ALL
        |  SELECT pb AS antecedent, pa AS consequent, supp_ab FROM pairs
        |)
        |SELECT r.antecedent, r.consequent, r.supp_ab,
        |       round(CAST(r.supp_ab AS DOUBLE) / sa.supp, 6) AS confidence,
        |       round((CAST(r.supp_ab AS DOUBLE) / sa.supp)
        |             / (CAST(sb.supp AS DOUBLE) / nb.n_baskets), 6) AS lift
        |FROM rules r
        |JOIN supp sa ON r.antecedent = sa.p
        |JOIN supp sb ON r.consequent = sb.p
        |CROSS JOIN nb""".stripMargin,

    "o17_source_quota" ->
      s"""WITH h AS (
         |  SELECT source, doc_id,
         |         ${permilleHashSql("doc_id", ":qta4", 1000000L)} AS hh
         |  FROM documents
         |), r AS (
         |  SELECT source, doc_id,
         |         row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rn
         |  FROM h
         |)
         |SELECT source, doc_id FROM r WHERE rn <= 10""".stripMargin,

    "d_sorted_neighbors" -> graft.dedup.Dedup.sortedNeighborOracleSql(
      "documents", "doc_id", "text", window = 4, keyLen = 12, threshold = 0.2),

    "er_link_scores" ->
      s"""WITH pert AS (
         |  SELECT c_custkey,
         |    CASE WHEN ${permilleHashSql("c_custkey", ":erN", 1000L)} < 300
         |         THEN 'customer' || substr(c_name, 9, 1000) ELSE c_name END AS c_name,
         |    CASE WHEN ${permilleHashSql("c_custkey", ":erB", 1000L)} < 250
         |         THEN c_acctbal + 10.0 ELSE c_acctbal END AS c_acctbal,
         |    CASE WHEN ${permilleHashSql("c_custkey", ":erS", 1000L)} < 200
         |         THEN 'UNKNOWN' ELSE c_mktsegment END AS c_mktsegment
         |  FROM customer
         |), aa AS (
         |  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         |         substr(c_name, 10, 7) AS blk
         |  FROM customer
         |), bb AS (
         |  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         |         substr(c_name, 10, 7) AS blk
         |  FROM pert
         |), pairs AS (
         |  SELECT aa.c_custkey AS id_a, bb.c_custkey AS id_b,
         |    (CASE WHEN aa.c_name = bb.c_name THEN 3 ELSE -1 END +
         |     CASE WHEN abs(aa.c_acctbal - bb.c_acctbal) <= 0.005 THEN 2 ELSE -2 END +
         |     CASE WHEN aa.c_mktsegment = bb.c_mktsegment THEN 1 ELSE -1 END) AS score
         |  FROM aa JOIN bb ON aa.blk = bb.blk
         |)
         |SELECT CAST(score AS BIGINT) AS score,
         |       CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST(SUM(CASE WHEN id_a = id_b THEN 1 ELSE 0 END) AS BIGINT) AS n_true
         |FROM pairs GROUP BY 1""".stripMargin,

    "ev_stream_full" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, date_trunc('second', ts) AS ts2 FROM events
        |), v AS (
        |  SELECT user_id AS u, event_id AS vid, ts2 AS vt FROM ev WHERE event_type = 'view'
        |), c AS (
        |  SELECT user_id AS u, event_id AS cid, ts2 AS ct FROM ev WHERE event_type = 'click'
        |), wm AS (
        |  SELECT least((SELECT max(vt) FROM v), (SELECT max(ct) FROM c)) AS w
        |), j AS (
        |  SELECT coalesce(v.u, c.u) AS u, v.vid, v.vt, c.cid, c.ct
        |  FROM v FULL JOIN c
        |    ON v.u = c.u AND c.ct >= v.vt AND c.ct <= v.vt + INTERVAL 30 MINUTE
        |)
        |SELECT u AS user_id,
        |       CAST(count(CASE WHEN vid IS NOT NULL AND cid IS NOT NULL THEN 1 END) AS BIGINT) AS n_pairs,
        |       CAST(SUM(CASE WHEN cid IS NULL AND vt + INTERVAL 30 MINUTE < (SELECT w FROM wm)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched_v,
        |       CAST(SUM(CASE WHEN vid IS NULL AND ct < (SELECT w FROM wm)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched_c
        |FROM j GROUP BY 1
        |HAVING count(CASE WHEN vid IS NOT NULL AND cid IS NOT NULL THEN 1 END) > 0
        |    OR SUM(CASE WHEN cid IS NULL AND vt + INTERVAL 30 MINUTE < (SELECT w FROM wm)
        |           THEN 1 ELSE 0 END) > 0
        |    OR SUM(CASE WHEN vid IS NULL AND ct < (SELECT w FROM wm)
        |           THEN 1 ELSE 0 END) > 0""".stripMargin,

    "a24_trimmed_mean" -> graft.ops.RobustStats.trimmedMeanOracleSql(
      "orders", Seq("o_orderstatus"), "o_totalprice", "o_orderkey", trim = 0.1),

    "a20_moments" ->
      """WITH b AS (
        |  SELECT o_orderstatus,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT) AS c
        |  FROM orders
        |), m AS (
        |  SELECT o_orderstatus, count(*) AS n,
        |         SUM(c) AS s1, SUM(c * c) AS s2,
        |         SUM(c * c * c) AS s3, SUM(c * c * c * c) AS s4
        |  FROM b GROUP BY 1
        |), dm AS (
        |  SELECT o_orderstatus, n,
        |         CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS d1,
        |         CAST(s2 AS DOUBLE) AS d2, CAST(s3 AS DOUBLE) AS d3,
        |         CAST(s4 AS DOUBLE) AS d4
        |  FROM m
        |), f AS (
        |  SELECT o_orderstatus, n, nd, d1, d2, d3, d4,
        |         d1 / nd AS mu,
        |         d2 / nd - (d1 / nd) * (d1 / nd) AS v
        |  FROM dm
        |)
        |SELECT o_orderstatus, CAST(n AS BIGINT) AS n,
        |       CASE WHEN v <= 0.0 THEN 0.0
        |            ELSE round((d3 / nd - 3.0 * mu * (d2 / nd) + 2.0 * mu * mu * mu)
        |                       / (v * sqrt(v)), 6) END AS skewness,
        |       CASE WHEN v <= 0.0 THEN 0.0
        |            ELSE round((d4 / nd - 4.0 * mu * (d3 / nd) + 6.0 * mu * mu * (d2 / nd)
        |                        - 3.0 * mu * mu * mu * mu) / (v * v) - 3.0, 6) END AS kurtosis
        |FROM f""".stripMargin,

    "g_degree_dist" ->
      """WITH e AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |), nodes AS (
        |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e
        |), deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM nodes GROUP BY 1
        |)
        |SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes FROM deg GROUP BY 1""".stripMargin,

    "g_kcore" -> graft.ops.KCore.peelOracleSql(
      s"""  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  WHERE ${permilleHashSql(
               "CAST(a.l_partkey AS VARCHAR) || ':' || CAST(b.l_partkey AS VARCHAR)",
               ":kcore", 1000L)} < 50""".stripMargin,
      k = 6, rounds = 3),

    "g_components" ->
      s"""WITH RECURSIVE pairs AS (
         |  SELECT DISTINCT a.l_partkey AS doc_a, b.l_partkey AS doc_b
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  WHERE ${permilleHashSql(
               "CAST(a.l_partkey AS VARCHAR) || ':' || CAST(b.l_partkey AS VARCHAR)",
               ":gcc", 1000L)} < 3
         |), edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs
         |), reach AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
         |), rep AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS rep_id FROM reach GROUP BY src
         |), lab AS (
         |  SELECT p.p_partkey AS doc_id, COALESCE(rep.rep_id, p.p_partkey) AS rep_id
         |  FROM part p LEFT JOIN rep ON p.p_partkey = rep.doc_id
         |), comp AS (
         |  SELECT rep_id, CAST(count(*) AS BIGINT) AS sz FROM lab GROUP BY 1
         |)
         |SELECT sz, CAST(count(*) AS BIGINT) AS n_components
         |FROM comp GROUP BY 1""".stripMargin,


    "dq_freshness" ->
      """WITH e AS (
        |  SELECT event_type,
        |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
        |  FROM events
        |), t AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |         MAX(sec) AS last_sec
        |  FROM e GROUP BY 1
        |)
        |SELECT event_type, n_events, last_sec,
        |       MAX(last_sec) OVER () - last_sec AS staleness_sec
        |FROM t""".stripMargin,

    "ev_attribution_linear" -> graft.ops.FunnelOps.linearAttributionOracleSql(
      "events", "user_id", "event_type", "ts",
      touchTypes = Seq("view", "click", "signup"), convType = "purchase",
      lookbackSec = 7L * 86400L),

    "ev_attribution_position" -> graft.ops.FunnelOps.positionAttributionOracleSql(
      "events", "user_id", "event_type", "ts", "event_id",
      touchTypes = Seq("view", "click", "signup"), convType = "purchase",
      lookbackSec = 7L * 86400L),

    "ev_session_native" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('second', ts) AS ts2, event_id FROM events
        |), s AS (
        |  SELECT user_id, ts2, event_id,
        |         CASE WHEN prev IS NULL
        |                OR epoch(ts2) - epoch(prev) >= 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM (SELECT *, lag(ts2) OVER (PARTITION BY user_id ORDER BY ts2, event_id) AS prev
        |        FROM e)
        |), g AS (
        |  SELECT user_id, ts2,
        |         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts2, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s
        |)
        |SELECT user_id, MIN(ts2) AS session_start, CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, sid""".stripMargin,

    "t_url_hosts" ->
      """WITH inj AS (
        |  SELECT doc_id,
        |         text
        |         || CASE WHEN doc_id % 4 = 0 THEN ' see https://'
        |              || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END
        |              || 'site' || CAST(doc_id % 7 AS VARCHAR) || '.example'
        |              || CASE WHEN doc_id % 3 = 0 THEN '.org' ELSE '.com' END
        |              || '/p/' || CAST(doc_id AS VARCHAR) ELSE '' END
        |         || CASE WHEN doc_id % 6 = 0 THEN ' also http://'
        |              || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END
        |              || 'site' || CAST(doc_id % 7 AS VARCHAR) || '.example'
        |              || CASE WHEN doc_id % 3 = 0 THEN '.org' ELSE '.com' END
        |              || '/q' ELSE '' END
        |         AS t
        |  FROM documents
        |), u AS (
        |  SELECT doc_id,
        |         unnest(regexp_extract_all(t, 'https?://([A-Za-z0-9.-]+)', 1)) AS raw
        |  FROM inj
        |)
        |SELECT regexp_replace(lower(raw), '^www\.', '') AS host,
        |       CAST(count(*) AS BIGINT) AS n_links,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM u GROUP BY 1""".stripMargin,

    "sql_q12_late" -> q12Sql,
    "sql_q14_promo" -> q14Sql,

    "sql_q19_parts" -> q19Sql,
    "sql_q2_mincost" -> q2Sql,
    "sql_q11_stockvalue" -> q11Sql,
    "sql_q16_suppcnt" -> q16Sql,
    "sql_q20_excess" -> q20Sql,

    "g_triangles" -> graft.ops.Triangles.countOracleSql(
      "SELECT a.l_partkey AS src, b.l_partkey AS dst FROM lineitem a " +
        "JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey"),

    "j13_interval_overlap" -> {
      val iv = "SELECT event_id AS id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS st, " +
        "CAST(epoch(date_trunc('second', ts)) AS BIGINT) + " +
        "GREATEST(1, CAST(FLOOR(value * 10) AS BIGINT)) AS en FROM events"
      s"""WITH pairs AS (
         |${graft.ops.IntervalJoin.overlapPairsOracleSql(
        s"SELECT * FROM ($iv) WHERE id % 2 = 0", s"SELECT * FROM ($iv) WHERE id % 2 = 1")}
         |)
         |SELECT a_id, count(*) AS n_overlap FROM pairs GROUP BY 1""".stripMargin
    },
  )
}
