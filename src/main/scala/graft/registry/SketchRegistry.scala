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

/** portable sketches (CMS, KMV, hist, bloom) — one slice of the driver registry.
  *
  * Split out of Shared.scala in r12 (maintainability: the single file
  * had reached 8.7k lines). PURE CODE MOTION: entry bodies and oracle SQL
  * are byte-identical to the pre-split registry; SparkEntry composes the
  * slices back into the same `queries`/`oracleSql` maps. r13: misfiled
  * entries re-homed to their named family slice (pure motion again, same
  * duplicate-key guard).
  */
private[graft] object SketchRegistry {
  import Shared._

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // trusted (the engine-private HLL/CMS/Bloom aggs can only be
    // rows-only; these md5-built twins land in CORRECTNESS) ----

    // count-min sketch over the corpus token stream: every distinct
    // token's estimate next to its exact count — CMS's overestimate
    // guarantee as data. Build is explode → hash-agg (the exchange moves
    // O(depth×width) cells per partition, never the token stream)
    "sk_cms_err" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("item"))
      val cms = graft.sketch.Sketches.cmsBuild(toks, "item")
      val exact = toks.groupBy("item").agg(count(lit(1)).as("exact_cnt"))
      graft.sketch.Sketches.cmsEstimate(cms, exact, "item")
        .join(exact, Seq("item"))
        .select(col("item"), col("exact_cnt"), col("cms_est"))
    }),

    // k-minimum-values distinct sketch on the order→customer key: the
    // (k-1)·2^60/h_k estimate and the exact distinct side by side, all
    // arithmetic identical-op-order doubles so both engines agree bitwise
    "sk_kmv_distinct" -> ((s, d) =>
      graft.sketch.Sketches.kmvDistinct(t(s, d, "orders"), "o_custkey")),

    // bloom membership accounting: suppliers as the member set, customers
    // as probes — zero false negatives and the realized false-positive
    // count as a single checkable row; the bit relation broadcasts
    "sk_bloom_fp" -> ((s, d) =>
      graft.sketch.Sketches.bloomMembership(
        t(s, d, "supplier"), "s_suppkey", t(s, d, "customer"), "c_custkey")),


    // training-mixture resampling: per-domain keep fractions that realize
    // target proportions (capped by the scarcest domain), decided row-wise
    // by the portable hash — the "data mixing" step of a pretraining
    // pipeline. No window, no per-domain sort: counts → a 4-row broadcast
    // of keep thresholds → one scan filter, which is the only shape that
    // survives domains of billions of rows
    "fe_mix_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .filter(col("source").isin("src0", "src1", "src2", "src3"))
        .withColumn("share",
          when(col("source") === "src0", 0.4)
            .when(col("source") === "src1", 0.3)
            .when(col("source") === "src2", 0.2)
            .otherwise(0.1))
      val counts = docs.groupBy("source", "share").agg(count(lit(1)).as("total"))
      val tcap = counts.agg(min(col("total") / col("share")).as("tcap"))
      val fracs = counts.crossJoin(tcap).select(
        col("source"), col("total"),
        when(col("tcap") === col("total") / col("share"), lit(1000000L))
          .otherwise(floor(lit(1000000.0) *
            least(lit(1.0), col("tcap") * col("share") / col("total")))).as("keep_ppm"))
      docs.join(broadcast(fracs), Seq("source"))
        .filter(permilleHash1M(col("doc_id"), ":mix42") < col("keep_ppm"))
        .groupBy("source", "total", "keep_ppm")
        .agg(count(lit(1)).as("kept"))
    }),
      // the domain DEFINING the cap keeps exactly 100%: tcap*share/total is
      // mathematically 1 there but rounds to 0.999… in doubles, and
      // floor(1e6·…) would shave ~1 ppm off the scarcest domain — compare
      // against the identical total/share double instead of trusting the
      // round-trip

    // leakage-safe temporal split with an embargo gap: train strictly
    // before the purge window, test strictly after — the time-series
    // counterpart of fe_group_split's entity split (a random split on
    // time-ordered data leaks future into train; the embargo also kills
    // boundary leakage from windowed features)
    "o13_time_split" -> ((s, d) => {
      val od = col("o_orderdate")
      t(s, d, "orders")
        .withColumn("split",
          when(od < lit("1997-01-01").cast("date"), "train")
            .when(od >= lit("1997-04-01").cast("date"), "test")
            .otherwise("embargo"))
        .groupBy("split")
        .agg(count(lit(1)).as("cnt"),
          min(od).as("min_date"), max(od).as("max_date"))
    }),

    // OHLC hourly downsample of the event stream: open/close picked under
    // an explicit (ts, id) total order via min_by/max_by on a struct key —
    // ONE hash-agg pass, no per-(key,hour) window sort
    "ev_ohlc" -> ((s, d) =>
      graft.ops.TimeSeriesOps.ohlc(
        Tables.events(s, d), "event_type", "ts", "value", "event_id")),

    // EWMA over daily counts at α = 1/2 — the dyadic-exact recurrence:
    // halving a double is exact, one correctly-rounded add per step, so
    // the left-to-right fold is bit-identical cross-engine (arbitrary α
    // wouldn't be). One (key, day) hash-agg; fold over each key's own
    // bounded daily series
    "ts_ewma" -> ((s, d) =>
      graft.ops.TimeSeriesOps.ewmaDaily(Tables.events(s, d), "event_type", "ts")),

    // Holt's linear-trend smoothing at α = β = 1/2 — ts_ewma's dyadic-
    // exact argument applied to the TWO-state (level, trend) recurrence;
    // h-step forecasts reported for h = 1, 7. Same one-hash-agg +
    // bounded-per-key-fold scale shape
    "ts_holt" -> ((s, d) =>
      graft.ops.TimeSeriesOps.holtDaily(Tables.events(s, d), "event_type", "ts")),

    // debounce/throttle: keep only each gap-session's first event —
    // session cumsum and keeper-pick share one (user) exchange
    "ev_debounce" -> ((s, d) =>
      graft.ops.TimeSeriesOps.debounce(
          Tables.events(s, d), "user_id", "ts", "event_id", gapSec = 1800L)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_kept"),
          countDistinct(col("user_id")).as("n_users"))),

    // recency-weighted engagement: per-segment half-life-decayed order
    // counts — every weight a power of two, so the double sum is EXACT and
    // order-independent (see TimeSeriesOps.decayedCounts)
    "fe_decay" -> ((s, d) => {
      val o = t(s, d, "orders").select("o_custkey", "o_orderdate")
      val c = t(s, d, "customer").select("c_custkey", "c_mktsegment")
      graft.ops.TimeSeriesOps.decayedCounts(
        o.join(broadcast(c), o("o_custkey") === c("c_custkey")),
        "c_mktsegment", "o_orderdate", refDate = "1998-08-01")
    }),

    // link prediction: non-adjacent part pairs sharing >=2 co-order
    // neighbors in the bulk-quantity graph — wedge pairs generated
    // array-side through degree-capped centers, never as a self-join's
    // shuffled rows (oracle runs the naive wedge join: strategy vs
    // textbook, hash-checked)
    "g_common_neighbors" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .filter(col("l_quantity") >= 40)
        .select("l_orderkey", "l_partkey")
      val edges = li.as("x")
        .join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      graft.ops.Triangles.commonNeighbors(edges, "src", "dst",
        maxDeg = 40, minCommon = 2L)
    }),

    // degree-weighted link prediction on the same graph: each common
    // neighbor endorses with the exact integer round(1e6/deg) — hub
    // endorsements count less (resource allocation, Zhou et al. 2009);
    // integer weights make the pair score an order-free SUM
    "g_link_ra" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .filter(col("l_quantity") >= 40)
        .select("l_orderkey", "l_partkey")
      val edges = li.as("x")
        .join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      graft.ops.Triangles.linkRA(edges, "src", "dst",
        maxDeg = 40, minCommon = 2L)
    }),

    // Q6-shaped forecast agg + Q10-shaped returned-item top-20 through
    // the shared-text SQL tier: the IDENTICAL string runs on both engines
    "sql_q6_forecast" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(Shared.q6Sql)
    }),
    "sql_q10_returns" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      s.sql(Shared.q10Sql)
    }),

    // Q18 shape: HAVING-subquery semi-filter + 3-table join + bounded
    // top-100 — the aggregate-under-IN pattern a planner must turn into
    // a semi-join, not a materialized subquery per probe
    "sql_q18_bigorders" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(Shared.q18Sql)
    }),

    // Q21 shape: correlated EXISTS + NOT EXISTS on a self-joined fact —
    // the planner must turn both into semi/anti joins on the order key,
    // never a per-row subquery probe (sole-blame supplier attribution:
    // a returned line on a multi-supplier order where no OTHER supplier
    // returned anything)
    "sql_q21_blame" -> ((s, d) => {
      Tables.supplier(s, d).createOrReplaceTempView("supplier")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(Shared.q21Sql)
    }),

    // melt/unpivot: wide measure columns → long (id, measure, value) rows
    // — the pandas-melt reshape; executor-side Expand, no shuffle at all
    "p14_unpivot" -> ((s, d) =>
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
          "l_discount", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_tax")),
          "measure", "value")),

    // window-function completeness: first/nth/lag-with-default on the
    // running frame, last_value over the full frame — one exchange for
    // all four (same partition key + order)
    "w9_window_suite" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        first(col("o_totalprice")).over(w).as("first_price"),
        nth_value(col("o_totalprice"), 3).over(w).as("third_price"),
        lag(col("o_totalprice"), 1, -1.0).over(w).as("prev_price"),
        last(col("o_totalprice")).over(full).as("last_price"))
    }),

    // EXACT rolling median over a 7-row frame of the pre-aggregated daily
    // series: the robust moving-centre a spikey metric needs (rolling mean
    // is in fe_decay/ev_rollingh). percentile() runs per frame — bounded
    // at 7 values — over the day-grain table, never the raw data
    "w10_rolling_median" -> ((s, d) => {
      val daily = t(s, d, "orders")
        .groupBy(col("o_orderpriority").as("prio"), to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("prio").orderBy("day").rowsBetween(-6, 0)
      daily.select(col("prio"), col("day"), col("cnt"),
        expr("percentile(cnt, 0.5)").over(w).as("med7"))
    }),

    // per-group Shannon entropy (nats) of a categorical — the data-card
    // "how concentrated is this column" profile; each p·ln(p) term is
    // micro-scaled to a LONG before summation (the t_bigram_lm pattern)
    // so the sum is order-independent and engine-portable
    "a17_entropy" -> ((s, d) => {
      val counts = t(s, d, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("c"))
      val wn = Window.partitionBy("o_orderpriority")
      counts
        .withColumn("n", sum("c").over(wn))
        .withColumn("_term_micro",
          round((col("c").cast("double") / col("n")) *
            log(col("c").cast("double") / col("n")) * 1e6).cast("long"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_cats"),
          round(-sum("_term_micro").cast("double") / 1e6, 6).as("entropy_nats"))
    }),

    // STREAM-STREAM LEFT OUTER join drained and hash-checked: inner pairs
    // emit immediately; unmatched views emit null-extended ONLY after the
    // watermark proves no future click can match — the oracle applies the
    // same eviction predicate, so the watermark-gated outer state machine
    // itself is verified, not just the happy inner path
    "ev_stream_outer" -> ((s, d) =>
      graft.streaming.StreamOps
        .streamStreamLeftOuter(s, d, "graft_ev_stream_outer")
        .groupBy(col("v_user").as("user_id"))
        .agg(
          count(col("c_id")).as("n_pairs"),
          sum(when(col("c_id").isNull, 1L).otherwise(0L)).as("n_unmatched"))),

    // pipeline-health monitoring: per-type DAILY ingest volume, flagged by
    // the partition-invariant rolling z-score machinery over a trailing
    // 7-day window — volume anomalies (a stuck producer, a double-ship)
    // surface as data, on |types × days| rows, never |events|
    // Benford's-law conformance of order totals — the classic DQ/fraud
    // screen: observed vs expected first-digit shares, exact integers
    // everywhere (digit from the decimal's string rendering, expectation
    // literals JVM-precomputed and shared with the oracle). One 9-group
    // hash-agg with map-side combine
    "dq_benford" -> ((s, d) =>
      graft.ops.StatsOps.benford(t(s, d, "orders"),
        col("o_totalprice").cast("decimal(12,2)"))),

    "dq_volume_anomaly" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_rows"))
        .select(
          concat(col("event_type"), lit(":"), col("day").cast("string")).as("rid"),
          col("event_type"),
          col("day").cast("timestamp").as("day_ts"),
          col("n_rows"))
      graft.ops.TimeSeriesOps.rollingAnomaly(
        daily, "event_type", "day_ts", "n_rows", "rid",
        horizonSec = 7L * 86400L, z = 2.0, minN = 4)
    }),

    // quote/subset detection: asymmetric shingle containment — the score
    // Jaccard structurally misses (a short doc embedded in a long one);
    // same inverted-index + DF-cap candidate shape as d_jaccard_pairs
    "d_containment" -> ((s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, threshold = 0.5, maxShingleDf = Some(100L))),

    // sketch MERGEABILITY as a hash-checked row: CMS is linear, so
    // per-shard sketches summed cell-wise must equal the whole-stream
    // sketch — the algebra that lets every executor summarize its shard
    // and the reduce combine d×w cells, never rows. n_mismatch pins it
    // at exactly 0
    "sk_cms_merge" -> ((s, d) => {
      def toks(p: Column => Column) = Tables.documents(s, d)
        .filter(p(col("doc_id")))
        .select(explode(TextOps.tokens(col("text"))).as("item"))
      val full = graft.sketch.Sketches.cmsBuild(toks(_ => lit(true)), "item")
      val even = graft.sketch.Sketches.cmsBuild(toks(id => id % 2 === 0), "item")
      val odd = graft.sketch.Sketches.cmsBuild(toks(id => id % 2 === 1), "item")
      val merged = graft.sketch.Sketches.cmsMerge(even, odd)
      val joined = full.withColumnRenamed("cnt", "cnt_full")
        .join(merged.withColumnRenamed("cnt", "cnt_merged"),
          Seq("j", "bucket"), "full_outer")
      joined.agg(
        count(lit(1)).as("n_cells"),
        sum(when(coalesce(col("cnt_full"), lit(-1L)) =!=
          coalesce(col("cnt_merged"), lit(-1L)), 1L).otherwise(0L)).as("n_mismatch"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "w10_rolling_median" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT prio, day, cnt,
        |       median(cnt) OVER (PARTITION BY prio ORDER BY day
        |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
        |FROM daily""".stripMargin,

    "dq_benford" -> graft.ops.StatsOps.benfordOracleSql(
      "orders", "CAST(o_totalprice AS DECIMAL(12,2))"),

    "sk_cms_err" -> graft.sketch.Sketches.cmsOracleSql(
      "SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')) AS item FROM documents"),

    "sk_kmv_distinct" -> graft.sketch.Sketches.kmvOracleSql("o_custkey", "orders"),

    "sk_bloom_fp" -> graft.sketch.Sketches.bloomOracleSql(
      "SELECT CAST(s_suppkey AS VARCHAR) AS k FROM supplier",
      "SELECT CAST(c_custkey AS VARCHAR) AS k FROM customer"),


    // keep thresholds derive from counts in identical-op-order double
    // arithmetic; the row-wise keep decision replays via the portable hash
    "fe_mix_sample" ->
      s"""WITH docs AS (
         |  SELECT doc_id, source,
         |         CASE source WHEN 'src0' THEN CAST(0.4 AS DOUBLE)
         |                     WHEN 'src1' THEN CAST(0.3 AS DOUBLE)
         |                     WHEN 'src2' THEN CAST(0.2 AS DOUBLE)
         |                     ELSE CAST(0.1 AS DOUBLE) END AS share
         |  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')
         |), counts AS (
         |  SELECT source, share, CAST(count(*) AS BIGINT) AS total FROM docs GROUP BY 1, 2
         |), t AS (SELECT min(total / share) AS tcap FROM counts
         |), f AS (
         |  SELECT source, total,
         |         CASE WHEN tcap = total / share THEN 1000000
         |              ELSE CAST(floor(1000000.0 * least(1.0, tcap * share / total)) AS BIGINT) END AS keep_ppm
         |  FROM counts CROSS JOIN t
         |)
         |SELECT f.source, f.total, f.keep_ppm, CAST(count(*) AS BIGINT) AS kept
         |FROM docs JOIN f ON docs.source = f.source
         |WHERE (${permilleHashSql("doc_id", ":mix42", 1000000L)}) < f.keep_ppm
         |GROUP BY 1, 2, 3""".stripMargin,

    "o13_time_split" ->
      """SELECT CASE WHEN o_orderdate < DATE '1997-01-01' THEN 'train'
        |            WHEN o_orderdate >= DATE '1997-04-01' THEN 'test'
        |            ELSE 'embargo' END AS split,
        |       CAST(count(*) AS BIGINT) AS cnt,
        |       min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
        |FROM orders GROUP BY 1""".stripMargin,

    "ev_ohlc" -> graft.ops.TimeSeriesOps.ohlcOracleSql(
      "events", "event_type", "ts", "value", "event_id"),

    "ts_ewma" -> graft.ops.TimeSeriesOps.ewmaDailyOracleSql(
      "events", "event_type", "ts"),

    "ts_holt" -> graft.ops.TimeSeriesOps.holtDailyOracleSql(
      "events", "event_type", "ts"),

    // same sessionize core as ev_sessionize's oracle, then the keeper is
    // row 1 of each (user, session) under the same (ts, id) total order
    "ev_debounce" ->
      """WITH x AS (
        |  SELECT user_id, event_id, event_type, date_trunc('second', ts) AS ts2,
        |         LAG(date_trunc('second', ts)) OVER (PARTITION BY user_id ORDER BY date_trunc('second', ts) NULLS FIRST, event_id) AS prev
        |  FROM events
        |), y AS (
        |  SELECT user_id, event_id, event_type, ts2,
        |         CASE WHEN prev IS NULL OR epoch(ts2) - epoch(prev) > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM x
        |), z AS (
        |  SELECT user_id, event_id, event_type, ts2,
        |         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts2 NULLS FIRST, event_id ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM y
        |), k AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id, sess ORDER BY ts2 NULLS FIRST, event_id) AS rn
        |  FROM z
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM k WHERE rn = 1 GROUP BY 1""".stripMargin,

    "fe_decay" -> graft.ops.TimeSeriesOps.decayedCountsOracleSql(
      "(SELECT c_mktsegment, o_orderdate FROM orders JOIN customer ON o_custkey = c_custkey)",
      "c_mktsegment", "o_orderdate", refDate = "1998-08-01"),

    "g_common_neighbors" -> graft.ops.Triangles.commonNeighborsOracleSql(
      "SELECT a.l_partkey AS src, b.l_partkey AS dst FROM lineitem a " +
        "JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "WHERE a.l_quantity >= 40 AND b.l_quantity >= 40",
      maxDeg = 40, minCommon = 2L),

    "g_link_ra" -> graft.ops.Triangles.linkRAOracleSql(
      "SELECT a.l_partkey AS src, b.l_partkey AS dst FROM lineitem a " +
        "JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "WHERE a.l_quantity >= 40 AND b.l_quantity >= 40",
      maxDeg = 40, minCommon = 2L),

    "sql_q6_forecast" -> q6Sql,
    "sql_q10_returns" -> q10Sql,

    "sql_q18_bigorders" -> q18Sql,
    "sql_q21_blame" -> q21Sql,

    "p14_unpivot" ->
      """SELECT l_orderkey, l_linenumber, m.measure, m.value
        |FROM lineitem,
        |LATERAL (VALUES ('l_quantity', l_quantity), ('l_extendedprice', l_extendedprice),
        |                ('l_discount', l_discount), ('l_tax', l_tax)) AS m(measure, value)""".stripMargin,

    "w9_window_suite" ->
      """SELECT o_orderkey, o_orderstatus,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  nth_value(o_totalprice, 3) OVER w AS third_price,
        |  lag(o_totalprice, 1, -1.0) OVER w AS prev_price,
        |  last_value(o_totalprice) OVER (
        |    PARTITION BY o_orderstatus
        |    ORDER BY o_orderdate NULLS FIRST, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_orderdate NULLS FIRST, o_orderkey)""".stripMargin,

    "a17_entropy" ->
      """WITH cn AS (
        |  SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1, 2
        |), t AS (
        |  SELECT o_orderpriority, c,
        |         SUM(c) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM cn
        |)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_cats,
        |       round(-CAST(SUM(CAST(round((CAST(c AS DOUBLE) / n) *
        |             ln(CAST(c AS DOUBLE) / n) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6, 6)
        |         AS entropy_nats
        |FROM t GROUP BY 1""".stripMargin,

    // the eviction predicate (vt + within < final watermark = min of the
    // two sides' max event times, delay 0) IS the outer join's semantic:
    // younger unmatched views are still awaiting a match when the bounded
    // drain ends, so they emit nothing — mirrored by the HAVING guard
    "ev_stream_outer" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, date_trunc('second', ts) AS ts2 FROM events
        |), v AS (
        |  SELECT user_id AS u, event_id AS vid, ts2 AS vt FROM ev WHERE event_type = 'view'
        |), c AS (
        |  SELECT user_id AS u, event_id AS cid, ts2 AS ct FROM ev WHERE event_type = 'click'
        |), wm AS (
        |  SELECT least((SELECT max(vt) FROM v), (SELECT max(ct) FROM c)) AS w
        |), j AS (
        |  SELECT v.u, v.vid, v.vt, c.cid
        |  FROM v LEFT JOIN c
        |    ON v.u = c.u AND c.ct >= v.vt AND c.ct <= v.vt + INTERVAL 30 MINUTE
        |)
        |SELECT u AS user_id,
        |       CAST(count(cid) AS BIGINT) AS n_pairs,
        |       CAST(SUM(CASE WHEN cid IS NULL AND vt + INTERVAL 30 MINUTE < (SELECT w FROM wm)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
        |FROM j GROUP BY 1
        |HAVING count(cid) > 0
        |    OR SUM(CASE WHEN cid IS NULL AND vt + INTERVAL 30 MINUTE < (SELECT w FROM wm)
        |            THEN 1 ELSE 0 END) > 0""".stripMargin,

    "dq_volume_anomaly" -> graft.ops.TimeSeriesOps.rollingAnomalyOracleSql(
      "(SELECT concat(event_type, ':', CAST(CAST(ts AS DATE) AS VARCHAR)) AS rid, " +
        "event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day_ts, count(*) AS n_rows " +
        "FROM events GROUP BY 1, 2, 3)",
      "event_type", "day_ts", "n_rows", "rid",
      horizonSec = 7L * 86400L, z = 2.0, minN = 4),

    "sk_cms_merge" -> graft.sketch.Sketches.cmsMergeOracleSql(
      "SELECT doc_id % 2 AS shard, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')) AS item FROM documents"),

    "d_containment" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS t
        |  FROM documents
        |), sh0 AS (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
        |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        |    FROM toks WHERE len(t) >= 3
        |  )
        |), keep AS (
        |  SELECT shingle FROM sh0 GROUP BY 1 HAVING count(*) <= 100
        |), sh AS (
        |  SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)
        |), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter_cnt,
        |       CAST(inter AS DOUBLE) / sa.n AS cont_a_in_b,
        |       CAST(inter AS DOUBLE) / sb.n AS cont_b_in_a
        |FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE GREATEST(CAST(inter AS DOUBLE) / sa.n, CAST(inter AS DOUBLE) / sb.n) >= 0.5""".stripMargin
  )
}
