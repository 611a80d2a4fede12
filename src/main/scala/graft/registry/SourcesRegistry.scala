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

/** scans, sources, sinks, format round-trips, and the DSv2/stream source rows — one slice of the driver registry.
  *
  * Split out of Shared.scala in r12 (maintainability: the single file
  * had reached 8.7k lines). PURE CODE MOTION: entry bodies and oracle SQL
  * are byte-identical to the pre-split registry; SparkEntry composes the
  * slices back into the same `queries`/`oracleSql` maps.
  */
private[graft] object SourcesRegistry {
  import Shared._

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "s2_scan_region" -> ((s, d) => t(s, d, "region").select("r_regionkey", "r_name")),

    // S6 sink closed-loop: write nation to CSV, read it back with an
    // explicit schema, hash-compare against the DuckDB view of the same
    // parquet table — proves quoting/typing survive the roundtrip.
    "s6_csv_roundtrip" -> ((s, d) => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_s6_csv_${new java.io.File(d).getName}"
      graft.core.Sinks.csv(
        t(s, d, "nation").select("n_nationkey", "n_name", "n_regionkey"),
        out, singleFile = true)
      s.read
        .option("header", "true")
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .csv(out)
    }),

    // S8/S9: the other built-in formats, same closed loop as s6 — write,
    // read back, hash against the DuckDB view of the ORIGINAL parquet
    // table, proving types/values survive each format's encoding. ORC is
    // the second columnar format (predicate pushdown + column pruning
    // apply there too); JSON-lines is the schema-on-read text format.
    "s8_orc_roundtrip" -> ((s, d) => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_s8_orc_${new java.io.File(d).getName}"
      t(s, d, "supplier").select("s_suppkey", "s_name", "s_nationkey")
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
    }),

    "s9_json_roundtrip" -> ((s, d) => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_s9_json_${new java.io.File(d).getName}"
      t(s, d, "region").select("r_regionkey", "r_name")
        .write.mode("overwrite").json(out)
      s.read.schema("r_regionkey BIGINT, r_name STRING").json(out)
    }),

    // S7 partitioned-parquet sink closed-loop: write orders partitioned by
    // o_orderpriority, read back filtered on the partition column. The
    // filter never touches row data — it prunes whole directories at
    // planning time (PartitionPruneSpec asserts exactly one of five
    // partitions is scanned). At 100 TB this is the layout decision that
    // turns "scan everything" into "scan 1/5th".
    "s7_partitioned_prune" -> ((s, d) => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_s7_part_${new java.io.File(d).getName}"
      graft.core.Sinks.parquet(
        t(s, d, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"),
        out, partitionBy = Seq("o_orderpriority"))
      s.read.parquet(out)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
    }),

    // S2 alternative source: JDBC (embedded Derby) — write nation through
    // the JDBC sink, read it back through the JDBC source, hash against
    // the DuckDB view of the original parquet. The non-file ingestion
    // surface, closed-loop. (In-memory Derby: this tests the format
    // plumbing; production JDBC reads partition via
    // partitionColumn/bounds — see Tables.jdbcTable.)
    "s10_jdbc_roundtrip" -> ((s, d) => {
      val url = s"jdbc:derby:memory:graft_${new java.io.File(d).getName};create=true"
      Tables.jdbcWrite(
        t(s, d, "nation").select("n_nationkey", "n_name", "n_regionkey"),
        url, "nation_jdbc")
      Tables.jdbcTable(s, url, "nation_jdbc")
    }),

    // Bucketed-layout co-located join: both sides written bucketBy the
    // join key (pay the shuffle ONCE at write time), read back through the
    // catalog, joined with zero exchanges on the join path — the canonical
    // repeated-big-join layout at 100 TB. BucketingSpec pins the no-Exchange
    // plan property with broadcast disabled; this declared query pins the
    // ANSWER through the bucketed write→catalog→read path.
    "s11_bucketed_join" -> ((s, d) => {
      val tag = new java.io.File(d).getName.replace('.', '_')
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft_s11_wh_$tag"
      val (ot, ct) = (s"graft_orders_b_$tag", s"graft_customer_b_$tag")
      t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").saveAsTable(ot)
      t(s, d, "customer").select("c_custkey", "c_mktsegment")
        .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/customer_b").saveAsTable(ct)
      s.table(ot).join(s.table(ct), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("revenue"))
    }),

    // Dynamic partition pruning: fact partitioned on the join key, dim
    // filtered at runtime — Spark injects the dim's surviving keys as a
    // partition filter into the fact scan (the 100 TB star-join staple:
    // scan only the partitions the dim selects, decided at execution
    // time). PlansSpec asserts the `dynamicpruning` subquery is in the
    // scan; this query pins the pruned answer.
    "s12_dpp_prune" -> ((s, d) => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_s12_dpp_${new java.io.File(d).getName}"
      graft.core.Sinks.parquet(
        t(s, d, "orders").select("o_orderkey", "o_totalprice", "o_orderpriority"),
        out, partitionBy = Seq("o_orderpriority"))
      val dim = t(s, d, "orders").select(col("o_orderpriority").as("prio"))
        .distinct()
        .withColumn("is_rush", col("prio").startsWith("1-") || col("prio").startsWith("2-"))
      s.read.parquet(out)
        .join(broadcast(dim.filter(col("is_rush"))), col("o_orderpriority") === col("prio"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
    }),

    // Z-order (Morton) layout verification: bucket orders by the
    // bit-interleaved (custkey-bucket, price-bucket) z-value and report
    // each bucket's bounding box — narrow boxes on BOTH dims is the
    // property that lets parquet min/max stats skip files for predicates
    // on either dimension (ZOrder.applyLayout is the write-side twin).
    "s13_zorder_stats" -> ((s, d) =>
      graft.ops.ZOrder.layoutStats(
        t(s, d, "orders"),
        x = pmod(col("o_custkey"), lit(1024)),
        y = least(floor(col("o_totalprice") / 1000.0), lit(1023.0)).cast("long"),
        tie = col("o_orderkey"),
        bits = 10, nBuckets = 16)),

    // Structured Streaming, oracled: the hourly windowed aggregation runs
    // as a REAL stream (file source → watermark → incremental state →
    // AvailableNow drain) and must produce the byte-identical answer to
    // the batch/DuckDB form — stream/batch parity as a hash-checked
    // invariant, not just a spec assertion.
    "ev_stream_hourly" -> ((s, d) =>
      graft.streaming.StreamOps.runToCompletion(
        graft.streaming.StreamOps.windowedCountsExact(
          graft.streaming.StreamOps.eventsStream(s, d)),
        "graft_ev_stream_hourly")),

    // streaming "trending now": the drained windowed-count state feeds the
    // TopKPerKey bounded-heap operator — top-2 event types per hour. The
    // streaming stage bounds state by watermark; the ranking stage never
    // sorts more than k rows per key; one oracle pins the composition
    "ev_stream_topk" -> ((s, d) => {
      val counts = graft.streaming.StreamOps.runToCompletion(
        graft.streaming.StreamOps.windowedCountsExact(
          graft.streaming.StreamOps.eventsStream(s, d)),
        "graft_ev_stream_topk")
      graft.plans.TopKPerKey(
        counts.select("hour_ts", "event_type", "cnt"),
        Seq("hour_ts"), Seq(col("cnt").desc, col("event_type").asc), 2)
    }),

    // ONLINE histogram-sketch build: fixed a-priori grid (a stream can't
    // min/max first — production metric pipelines declare bucket bounds),
    // associative bucket counts through the incremental micro-batch path,
    // state ≤ buckets rows at any volume; the drained build must equal
    // the batch histogram bit-for-bit
    "ev_stream_hist" -> ((s, d) =>
      graft.streaming.StreamOps.histViaStream(
        s, d, "graft_ev_stream_hist", lo = 0.0, hi = 512.0, buckets = 128)),

    // ONLINE drift gate: (bin, slice) counts build incrementally in the
    // state store (≤ buckets rows), the PSI readout runs over the drained
    // counts with the SAME arithmetic as batch drift_psi — oracled against
    // the batch answer on identical input
    "ev_stream_psi" -> ((s, d) =>
      graft.streaming.StreamOps.psiViaStream(
        s, d, "graft_ev_stream_psi",
        splitTs = "2024-01-16 00:00:00", binWidth = 50.0, buckets = 10)),

    // STREAMING near-dup gate: documents stream through the stateless
    // per-row MinHash band generator into a per-bucket min-id state
    // machine; a doc is flagged iff any of its buckets saw an earlier
    // doc. The drained flags must equal the batch LSH answer (the same
    // banded CTE chain as d_minhash_pairs closes the oracle)
    "d_stream_neardup" -> ((s, d) =>
      graft.streaming.StreamOps.nearDupViaStream(s, d, "graft_d_stream_neardup")),

    // the flatMapGroupsWithState session state machine, drained and
    // hash-checked against the SAME DuckDB oracle as the batch
    // `ev_sessionize` — custom streaming state semantics verified
    // end-to-end, not just spec-pinned
    "ev_stream_sessions" -> ((s, d) =>
      graft.streaming.StreamOps.sessionCountsViaStream(s, d, "graft_ev_stream_sessions")),

    // ONLINE last-touch attribution: per-user keyed state holds only the
    // latest touch, conversions attribute as they arrive (exactly-once
    // Append emissions), and the drained aggregate hash-matches the same
    // DuckDB oracle as the batch window form `ev_attribution`
    "ev_stream_attribution" -> ((s, d) =>
      graft.streaming.StreamOps.attributionViaStream(s, d, "graft_ev_stream_attr")),

    // STREAM-STATIC join, drained and hash-checked: the incremental side
    // (events) joins a broadcast static dimension (customer) before the
    // stateful aggregation — the enrich-then-aggregate shape every
    // streaming pipeline needs; the static side is planned per micro-batch
    // with the usual broadcast join, no state
    "ev_stream_join" -> ((s, d) => {
      val cust = t(s, d, "customer").select(col("c_custkey"), col("c_mktsegment"))
      val agg = graft.streaming.StreamOps.eventsStream(s, d)
        .join(broadcast(cust), col("user_id") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      graft.streaming.StreamOps.runToCompletion(agg, "graft_ev_stream_join")
    }),

    // STREAM-STREAM inner join with a time-range condition, drained and
    // hash-checked: views joined to clicks of the same user within 30
    // minutes — state on BOTH sides, evicted by watermark + range bound.
    // The drained pairs aggregate in batch (bounded result) and must
    // equal the batch self-join the DuckDB oracle runs.
    "ev_stream_pairs" -> ((s, d) =>
      graft.streaming.StreamOps
        .streamStreamPairs(s, d, "graft_ev_stream_pairs")
        .groupBy(col("v_user").as("user_id"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(unix_timestamp(col("c_ts")) - unix_timestamp(col("v_ts")))
            .as("sum_gap_s"))),

    // SLIDING event-time windows (1h length, 30min slide — each event in 2
    // windows), drained and hash-checked: the overlap arithmetic the
    // tumbling ev_stream_hourly can't exercise
    "ev_stream_sliding" -> ((s, d) => {
      val agg = graft.streaming.StreamOps.eventsStream(s, d)
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("w.start").as("win_start"), col("event_type"), col("cnt"))
      graft.streaming.StreamOps.runToCompletion(agg, "graft_ev_stream_sliding")
    }),

    // streaming exact-dedup drained and hash-checked: keep-first per
    // (user_id, event_type). Equality with batch DISTINCT requires that no
    // key's state evicts mid-drain — for a bounded backfill that means
    // choosing a watermark delay ≥ the data's time span (state is then
    // bounded by |distinct keys|, not by the horizon). A live pipeline
    // picks the horizon instead and accepts re-admittance past it — that
    // trade is the operator's contract, not an accident of batching.
    "ev_stream_dedup" -> ((s, d) => {
      val deduped = graft.streaming.StreamOps.dedupStream(
        graft.streaming.StreamOps.eventsStream(s, d), Seq("user_id", "event_type"),
        watermark = "3650 days")
      graft.streaming.StreamOps.runToCompletion(
          deduped, "graft_ev_stream_dedup",
          org.apache.spark.sql.streaming.OutputMode.Append())
        .groupBy("event_type").agg(count(lit(1)).as("n_keys"))
    }),

    // streaming CDC materialization: foreachBatch latest-wins upsert into
    // a keyed state table (atomic dir-swap stand-in for a transactional
    // MERGE sink); "latest" is an associative max, so the materialized
    // table — and this aggregate over it — is batching-invariant and the
    // batch window oracle pins it exactly
    "ev_stream_upsert" -> ((s, d) =>
      graft.streaming.StreamOps.upsertViaStream(s, d, "graft_ev_stream_upsert")),
  )

  val oracles: Seq[(String, String)] = Seq(
    "s2_scan_region" -> "SELECT r_regionkey, r_name FROM region",

    // the streaming drain must equal the batch window form exactly
    "ev_stream_sessions" -> sessionizeSql,

    "s6_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",

    "s8_orc_roundtrip" ->
      "SELECT s_suppkey, s_name, s_nationkey FROM supplier",

    "s9_json_roundtrip" ->
      "SELECT r_regionkey, r_name FROM region",

    "s7_partitioned_prune" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1""".stripMargin,

    "s11_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS cnt,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1""".stripMargin,

    // the one-row-per-priority dim makes the join a pure partition filter
    "s12_dpp_prune" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
        |GROUP BY 1""".stripMargin,

    "ev_stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_ts, event_type, count(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "d_stream_neardup" ->
      Dedup.streamNearDupOracleSql("documents", "doc_id", "text"),

    "s13_zorder_stats" ->
      s"""WITH b AS (
         |  SELECT o_custkey % 1024 AS x,
         |         CAST(least(floor(o_totalprice / 1000.0), 1023.0) AS BIGINT) AS y,
         |         o_orderkey AS tie
         |  FROM orders
         |), z AS (
         |  SELECT x, y, tie, ${graft.ops.ZOrder.zValueSql("x", "y", 10)} AS zv FROM b
         |), nt AS (
         |  SELECT x, y, ntile(16) OVER (ORDER BY zv, tie) AS bucket FROM z
         |)
         |SELECT bucket, count(*) AS n,
         |       min(x) AS min_x, max(x) AS max_x,
         |       min(y) AS min_y, max(y) AS max_y
         |FROM nt GROUP BY 1""".stripMargin,

    "ev_stream_dedup" ->
      """SELECT event_type, count(*) AS n_keys FROM (
        |  SELECT DISTINCT user_id, event_type FROM events
        |) GROUP BY 1""".stripMargin,

    "ev_stream_topk" ->
      """WITH c AS (
        |  SELECT date_trunc('hour', ts) AS hour_ts, event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT hour_ts, event_type, cnt FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY hour_ts
        |    ORDER BY cnt DESC, event_type) AS rn
        |  FROM c
        |) WHERE rn <= 2""".stripMargin,

    // batch mirror of the streaming fixed-grid histogram build:
    // lo=0, hi=512, 128 cells → width 4.0 (exact binary), end clamps
    "ev_stream_hist" ->
      """SELECT CAST(least(greatest(floor((CAST(value AS DOUBLE) - 0.0) / 4.0), 0), 127) AS BIGINT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1""".stripMargin,

    // the CDC-materialized table is "latest row per user" — the batch
    // window form pins the foreachBatch merge exactly (second-truncated
    // ts, event_id tiebreak, matching the engine's merge key)
    "ev_stream_upsert" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value,
        |         date_trunc('second', ts) AS ts2
        |  FROM events
        |), r AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY user_id ORDER BY ts2 DESC, event_id DESC) AS rn
        |  FROM e
        |)
        |SELECT event_type, count(*) AS n_users,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM r WHERE rn = 1 GROUP BY 1""".stripMargin,

    "ev_stream_join" ->
      """SELECT c_mktsegment, count(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1""".stripMargin,

    // sliding windows: each event lands in exactly two 30-min-aligned
    // 1-hour windows (epoch-aligned, Spark's default startTime=0)
    "ev_stream_sliding" ->
      """WITH e AS (
        |  SELECT event_type, CAST(FLOOR(epoch(ts) / 1800) AS BIGINT) * 1800 AS b FROM events
        |), w AS (
        |  SELECT event_type, b AS s FROM e
        |  UNION ALL
        |  SELECT event_type, b - 1800 FROM e
        |)
        |SELECT make_timestamp(s * 1000000) AS win_start, event_type, count(*) AS cnt
        |FROM w GROUP BY 1, 2""".stripMargin,

    "ev_stream_pairs" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('second', ts) AS ts2, event_type FROM events
        |)
        |SELECT v.user_id AS user_id, count(*) AS n_pairs,
        |       CAST(SUM(epoch(c.ts2) - epoch(v.ts2)) AS BIGINT) AS sum_gap_s
        |FROM e v JOIN e c
        |  ON v.user_id = c.user_id
        | AND c.ts2 >= v.ts2 AND c.ts2 <= v.ts2 + INTERVAL 30 MINUTE
        |WHERE v.event_type = 'view' AND c.event_type = 'click'
        |GROUP BY 1""".stripMargin,

    "s10_jdbc_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",

    "ev_stream_psi" ->
      """WITH s AS (
        |  SELECT least(greatest(CAST(floor(value / 50.0) AS BIGINT), 0), 9) AS bin,
        |         ts < TIMESTAMP '2024-01-16 00:00:00' AS isref
        |  FROM events WHERE value IS NOT NULL
        |), b AS (
        |  SELECT bin,
        |         CAST(SUM(CASE WHEN isref THEN 1 ELSE 0 END) AS BIGINT) AS ref_cnt,
        |         CAST(SUM(CASE WHEN isref THEN 0 ELSE 1 END) AS BIGINT) AS cur_cnt
        |  FROM s GROUP BY bin
        |), tot AS (
        |  SELECT CAST(SUM(ref_cnt) AS BIGINT) AS rt, CAST(SUM(cur_cnt) AS BIGINT) AS ct,
        |         CAST(COUNT(*) AS BIGINT) AS nb
        |  FROM b
        |)
        |SELECT bin, ref_cnt, cur_cnt,
        |  round((ref_cnt + 0.5) / (rt + 0.5 * nb), 9) AS p_ref,
        |  round((cur_cnt + 0.5) / (ct + 0.5 * nb), 9) AS p_cur,
        |  round(((cur_cnt + 0.5) / (ct + 0.5 * nb) - (ref_cnt + 0.5) / (rt + 0.5 * nb))
        |        * ln(((cur_cnt + 0.5) / (ct + 0.5 * nb)) / ((ref_cnt + 0.5) / (rt + 0.5 * nb))), 6) AS psi_term
        |FROM b, tot""".stripMargin,

    // the streaming drain answers the SAME question on the same input —
    // one oracle pins both the window form and the state machine
    "ev_stream_attribution" -> graft.ops.FunnelOps.lastTouchAttributionOracleSql(
      "events", "user_id", "event_type", "ts", "event_id",
      touchTypes = Seq("view", "click", "signup"), convType = "purchase",
      lookbackSec = 7L * 86400L),
  )
}
