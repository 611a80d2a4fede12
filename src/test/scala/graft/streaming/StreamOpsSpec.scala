package graft.streaming

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamOpsSpec extends SparkSpecBase {
  import StreamOps._

  private def ts(min: Int): Timestamp = new Timestamp(3600L * 1000 + min * 60000L)

  test("windowedCounts aggregates tumbling event-time windows over a stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(70), 2, "view", 3.0) // next hour window
    )
    val q = windowedCounts(input.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("cnt"))).toSet
      assert(rows == Set(("click", 2L), ("view", 1L)))
    } finally q.stop()
  }

  test("sessionize splits on gaps and counts per session (streaming state)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "a", 0.0),
      Event(2, ts(5), 1, "a", 0.0),   // same session (5 min gap)
      Event(3, ts(60), 1, "a", 0.0),  // 55 min gap > 30 min -> new session
      Event(4, ts(0), 2, "b", 0.0)
    )
    val q = sessionize(input.toDS(), gapSeconds = 1800L)
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sess").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"), r.getAs[Long]("n_events"))).toSet
      // user 1: closed session 0 with 2 events, open session 1 with 1 event
      assert(rows.contains((1L, 0L, 2L)))
      assert(rows.contains((1L, 1L, 1L)))
      assert(rows.contains((2L, 0L, 1L)))
    } finally q.stop()
  }

  test("attribute: keyed touch state credits conversions across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = StreamOps.attribute(
      input.toDS(), touchTypes = Set("click", "view"), convType = "buy",
      lookbackSec = 3600L)
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: u1 touches (click), u2 converts untouched; u3's touch and
      // conversion share a second — smaller-id touch must be credited
      input.addData(
        Event(1, ts(0), 1, "click", 0.0),
        Event(2, ts(1), 2, "buy", 0.0),
        Event(3, ts(2), 3, "click", 0.0),
        Event(4, ts(2), 3, "buy", 0.0))
      q.processAllAvailable()
      // batch 2: u1 converts off state from batch 1; then a view retouches
      // and a second conversion follows — latest touch wins
      input.addData(
        Event(5, ts(10), 1, "buy", 0.0),
        Event(6, ts(11), 1, "view", 0.0),
        Event(7, ts(12), 1, "buy", 0.0),
        // u2's conversion AFTER its touch-less conversion: now touched
        Event(8, ts(20), 2, "view", 0.0),
        Event(9, ts(90), 2, "buy", 0.0)) // 70 min later > 1h lookback
      q.processAllAvailable()
      val rows = spark.table("attr").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("channel")).toMap
      assert(rows == Map(
        2L -> "(none)",  // converted before any touch
        4L -> "click",   // same-second touch, smaller id → strictly preceding
        5L -> "click",   // state carried across the batch boundary
        7L -> "view",    // retouch supersedes the older click
        9L -> "(none)"   // touch aged past the lookback
      ))
    } finally q.stop()
  }

  test("mergeLatestBatch: latest-wins upsert is batching-invariant across merges") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_upsert_spec")
    val state = tmp.resolve("state"); val next = tmp.resolve("next")
    def batch(rows: (Long, Long, Long, String, Double)*) =
      rows.toDF("user_id", "sec", "event_id", "event_type", "value")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
        .select("user_id", "ts", "event_id", "event_type", "value")
    // batch 1: u1 and u2 get rows; batch 2: u1 superseded by a LATER ts,
    // u2 receives an EARLIER ts (must not regress), u3 ties on ts and the
    // larger event_id wins
    StreamOps.mergeLatestBatch(batch(
      (1L, 100L, 1L, "a", 1.0), (2L, 200L, 2L, "b", 2.0), (3L, 300L, 3L, "c", 3.0)),
      state, next)
    StreamOps.mergeLatestBatch(batch(
      (1L, 150L, 4L, "d", 4.0), (2L, 50L, 5L, "e", 5.0), (3L, 300L, 6L, "f", 6.0)),
      state, next)
    val got = spark.read.parquet(state.toString).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("event_id"), r.getAs[String]("event_type")))).toMap
    assert(got == Map(
      1L -> ((4L, "d")), // later ts wins
      2L -> ((2L, "b")), // earlier ts must not replace
      3L -> ((6L, "f"))  // same ts, larger event_id wins
    ))
  }

  test("streaming upsert drain equals the batch last-per-user aggregate") {
    val streamed = StreamOps.upsertViaStream(spark, sfDir, "spec_stream_upsert")
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_users"), r.getAs[Double]("sum_value")))).toMap
    val batch = graft.core.Tables.events(spark, sfDir)
      .withColumn("ts2", date_trunc("second", col("ts")))
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("ts2").desc, col("event_id").desc)))
      .filter(col("_rn") === 1)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_users"), r.getAs[Double]("sum_value")))).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming attribution drain equals the batch window form exactly") {
    import org.apache.spark.sql.functions._
    val batch = graft.SparkEntry.queries("ev_attribution")(spark, sfDir).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_conv"), r.getAs[Long]("n_users"))).toMap
    val streamed = StreamOps.attributionViaStream(spark, sfDir, "spec_stream_attr")
      .collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_conv"), r.getAs[Long]("n_users"))).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "streaming state-machine attribution diverges from the batch window form")
  }

  test("full-outer drain restricted to left rows equals the left-outer drain") {
    // the two-sided state machine must not change the one-sided answer:
    // inner pairs + evicted-unmatched-left rows are identical; full outer
    // only ADDS evicted-unmatched-right rows
    def key(r: org.apache.spark.sql.Row) =
      (Option(r.getAs[java.lang.Long]("v_id")).map(_.longValue),
        Option(r.getAs[java.lang.Long]("c_id")).map(_.longValue))
    val lo = StreamOps.streamStreamLeftOuter(spark, sfDir, "spec_fo_left")
      .collect().map(key).toSeq.sorted
    val fo = StreamOps.streamStreamFullOuter(spark, sfDir, "spec_fo_full")
      .collect()
    val foLeft = fo.filter(r => !r.isNullAt(r.fieldIndex("v_id")))
      .map(key).toSeq.sorted
    assert(foLeft == lo)
    assert(fo.exists(r => r.isNullAt(r.fieldIndex("v_id")))) // right evictions present
  }

  test("RocksDB state store: the drain answer is provider-independent") {
    // a production deployment sizes state with RocksDB instead of the
    // default HDFS-backed in-memory maps; the answer must not depend on
    // the provider. This drains the same windowed aggregation under both
    // providers and compares exactly.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val default = spark.conf.getOption(key)
    def drain(name: String) = StreamOps.runToCompletion(
      StreamOps.windowedCountsExact(StreamOps.eventsStream(spark, sfDir)),
      name).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("hour_ts"), r.getAs[String]("event_type")) ->
        ((r.getAs[Long]("cnt"), r.getAs[Double]("sum_value")))).toMap
    val base = drain("spec_provider_default")
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocks = drain("spec_provider_rocksdb")
      assert(rocks.nonEmpty)
      assert(rocks == base)
    } finally default match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("batch/stream parity: windowedCounts matches the batch ev_hour_agg shape") {
    import spark.implicits._
    val batch = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(70), 2, "view", 3.0)
    ).toDF()
    val out = windowedCounts(batch).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("cnt"))).toSet
    assert(out == Set(("click", 2L), ("view", 1L)))
  }

  test("dedupStream drops within-watermark duplicate keys, keeps distinct ones") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(1, ts(5), 1, "click", 1.0),  // duplicate event_id within watermark
      Event(2, ts(10), 2, "view", 2.0)
    )
    val q = StreamOps.dedupStream(input.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getAs[Long]("event_id")).sorted
      assert(ids.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming sessionize over real events equals the batch sessionization") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    // batch truth: the oracled ev_sessionize form (same 1800s gap, same
    // (ts2, event_id) tiebreak); compare per-user sorted session-size
    // multisets because session NUMBERING is an internal detail
    def sizesByUser(rows: Seq[(Long, Long)]): Map[Long, Seq[Long]] =
      rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap

    val batch = graft.SparkEntry.queries("ev_sessionize")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toSeq

    val stream = StreamOps.eventsStream(spark, sfDir)
      .withColumn("ts", date_trunc("second", col("ts")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamOps.Event]
    spark.catalog.dropTempView("spec_sessionize")
    val q = StreamOps.sessionize(stream, gapSeconds = 1800L)
      .writeStream.format("memory").queryName("spec_sessionize")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // single bounded batch: every session is emitted exactly once (closed
    // rows when superseded + the final open row per user at batch end)
    val streamed = spark.table("spec_sessionize").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toSeq

    assert(streamed.nonEmpty)
    assert(sizesByUser(streamed) == sizesByUser(batch),
      "streaming state-machine sessions diverge from the batch window form")
  }

  test("checkpointed restart: dedup state survives, no duplicate re-emission") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_stream_restart")
    // clean slate per run
    if (java.nio.file.Files.exists(base)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    val src = s"$base/src"; val out = s"$base/out"; val chk = s"$base/chk"
    val ev = graft.core.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")

    def drain(): Unit = {
      val schema = spark.read.parquet(src).schema
      val stream = spark.readStream.schema(schema).parquet(src)
      // effectively-infinite watermark delay: keep ALL dedup state so the
      // restart test isolates checkpoint recovery from state eviction
      val q = StreamOps.dedupStream(stream, Seq("event_id"), watermark = "87600 hours")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    ev.filter(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    drain()
    val n1 = spark.read.parquet(out).count()
    assert(n1 > 0)

    // restart with overlapping input: evens are duplicates (must be dropped
    // by RESTORED state), odds are new (must be emitted)
    ev.write.mode("append").parquet(src)
    drain()
    val result = spark.read.parquet(out)
    val total = ev.count()
    assert(result.count() == total,
      s"expected $total once-each rows, got ${result.count()}")
    assert(result.select("event_id").distinct().count() == total,
      "duplicate event_ids were re-emitted across the restart")
  }

  test("AvailableNow drain over real events parquet equals the batch answer exactly") {
    import org.apache.spark.sql.functions._
    val streamed = StreamOps.runToCompletion(
      StreamOps.windowedCountsExact(StreamOps.eventsStream(spark, sfDir)),
      "spec_ev_stream")
    val batch = graft.core.Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    assert(streamed.count() > 0)
    // exact set equality, including the decimal-accumulated double sums
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream-stream LEFT OUTER drain: inner pairs + watermark-evicted unmatched only") {
    import org.apache.spark.sql.functions._
    val drained = StreamOps.streamStreamLeftOuter(spark, sfDir, "spec_ev_stream_outer")
    val ev = graft.core.Tables.events(spark, sfDir)
      .withColumn("ts2", date_trunc("second", col("ts")))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("u"), col("event_id").as("vid"), col("ts2").as("vt"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("cid"), col("ts2").as("ct"))
    val wm = java.sql.Timestamp.valueOf(
      Seq(v.agg(max("vt")).head().getTimestamp(0),
          c.agg(max("ct")).head().getTimestamp(0)).map(_.toString).min)
    val batch = v.join(c,
        col("u") === col("cu") && col("ct") >= col("vt") &&
          col("ct") <= col("vt") + expr("INTERVAL 30 MINUTES"), "left")
    val nPairs = batch.filter(col("cid").isNotNull).count()
    val nEvictedUnmatched = batch.filter(col("cid").isNull &&
      col("vt") + expr("INTERVAL 30 MINUTES") < lit(wm)).count()
    assert(drained.filter(col("c_id").isNotNull).count() == nPairs)
    assert(drained.filter(col("c_id").isNull).count() == nEvictedUnmatched)
    assert(nPairs > 0 && nEvictedUnmatched > 0, "fixture must exercise both paths")
  }

  test("nearDup: per-bucket min-id state flags later colliders across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[BandRow]
    // batch 1: docs 1 and 2 collide in (0,"x") -> 2 is dup; doc 3 alone
    input.addData(BandRow(1L, 0, "x"), BandRow(2L, 0, "x"), BandRow(3L, 1, "y"))
    val q = nearDup(input.toDS())
      .writeStream.format("memory").queryName("nd").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // batch 2: doc 5 collides with REMEMBERED bucket (0,"x") -> dup;
      // doc 6 collides with (1,"y") from batch 1 -> dup; doc 7 fresh
      input.addData(BandRow(5L, 0, "x"), BandRow(6L, 1, "y"), BandRow(7L, 2, "z"))
      q.processAllAvailable()
      val rows = spark.table("nd").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("dup")).toMap
      assert(rows == Map(1L -> false, 2L -> true, 3L -> false,
        5L -> true, 6L -> true, 7L -> false))
    } finally q.stop()
  }

  test("minhashBandsPerRow (stream-safe, shuffle-free) emits the identical " +
    "(doc, band, bucket) set as the batch signature path") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different text with many other words inside it here"),
      (4L, "an") // < n tokens: no shingles, no bands on either path
    ).toDF("doc_id", "text")
    val perRow = graft.dedup.Dedup.minhashBandsPerRow(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val sig = graft.dedup.Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, k = 32)
    val bandCols = (0 until 8).map { b =>
      val cols = (b * 4 until (b + 1) * 4).map(i => col(s"mh_$i"))
      struct(lit(b).as("band"), concat_ws("_", cols: _*).as("bucket"))
    }
    val batch = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(perRow == batch)
    assert(perRow.nonEmpty && !perRow.exists(_._1 == 4L))
    // identical docs produce identical buckets in every band
    val b1 = perRow.collect { case (1L, b, k) => (b, k) }
    val b2 = perRow.collect { case (2L, b, k) => (b, k) }
    assert(b1 == b2)
  }

  test("nearDupDrainDir: the rate-limited multi-batch drain (the Scale " +
    "harness's entry point) flags exactly the batch LSH answer however " +
    "the files split the corpus") {
    import spark.implicits._
    val n = 400L
    val docs = graft.sources.ScaleSynth.documents(spark, n)
    val dir = java.nio.file.Files.createTempDirectory("graft_spec_neardup_dir")
    try {
      docs.repartition(4).write.mode("overwrite").parquet(dir.toString)
      // batch answer: a doc is near-dup iff it shares a band bucket with a
      // SMALLER doc id (the state machine's min-id contract)
      val bands = graft.dedup.Dedup.minhashBandsPerRow(docs, "doc_id", "text")
      val want = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("b.doc_id") < col("a.doc_id"))
        .select(col("a.doc_id")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(want.nonEmpty, "no planted near-dups found — generator contract broken")
      def flagged(filesPerTrigger: Int, tag: String): Set[Long] =
        graft.streaming.StreamOps.nearDupDrainDir(
            spark, dir.toString, s"nd_dir_spec_$tag", filesPerTrigger)
          .filter(col("dup")).select("doc_id").distinct()
          .collect().map(_.getLong(0)).toSet
      // all 4 files in ONE trigger: within-batch min-id = the global
      // batch LSH answer, exactly
      val oneBatch = flagged(4, "one")
      assert(oneBatch == want,
        s"single-batch drain diverges from batch LSH: " +
          s"only-stream=${(oneBatch -- want).take(5)} only-batch=${(want -- oneBatch).take(5)}")
      // 4 micro-batches in ARBITRARY file order: the streaming contract is
      // first-SEEN-wins, so a pair split across batches with the smaller
      // id arriving later legitimately flags nobody — the drain must be a
      // SUBSET of the batch answer (no false positives), never a superset
      val multi = flagged(1, "multi")
      assert(multi.nonEmpty && multi.subsetOf(want),
        s"multi-batch drain invented flags: ${(multi -- want).take(5)}")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
  }

  test("nearDupViaStream plan: band generation is stateless per-row (no " +
    "aggregate before the state machine)") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val bands = graft.dedup.Dedup.minhashBandsPerRow(docs, "doc_id", "text")
    // zero exchanges: the whole band computation is projection + explode
    val plan = bands.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("psiViaStream drain equals the batch psiBins on identical input") {
    val out = psiViaStream(spark, sfDir, "psi_spec_drain",
      splitTs = "2024-01-16 00:00:00", binWidth = 50.0, buckets = 10)
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val batch = graft.ops.DriftOps.psiBins(
      ev.filter(col("value").isNotNull),
      isRef = col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"),
      bin = least(greatest(floor(col("value").cast("double") / 50.0), lit(0L)), lit(9L)))
    assert(out.exceptAll(batch).isEmpty && batch.exceptAll(out).isEmpty)
  }
}
