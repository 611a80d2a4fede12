package graft.ops

import java.sql.Timestamp

import graft.SparkSpecBase

class TimeSeriesOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // user 1: three events inside one 24h span plus one far later;
  // user 2: a single event (window of itself only)
  private val events = Seq(
    (1L, 10L, ts("2024-01-01 00:00:00"), 1.0),
    (2L, 10L, ts("2024-01-01 12:00:00"), 2.0),
    (3L, 10L, ts("2024-01-01 23:59:59"), 4.0), // 86399s after e1 -> still in
    (4L, 10L, ts("2024-01-05 00:00:00"), 8.0), // out of every earlier window
    (5L, 20L, ts("2024-01-02 06:00:00"), 16.0)
  ).toDF("event_id", "user_id", "ts", "value")

  test("rollingAgg sums exactly the trailing horizon, inclusive ends") {
    val out = TimeSeriesOps.rollingAgg(events, "user_id", "ts", "value", "event_id", 86400L)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Double]("roll_sum"), r.getAs[Long]("roll_n"))).toMap
    assert(out(1L) == (1.0, 1L))
    assert(out(2L) == (3.0, 2L))
    assert(out(3L) == (7.0, 3L)) // e1 at exactly horizon-1 seconds back: in
    assert(out(4L) == (8.0, 1L))
    assert(out(5L) == (16.0, 1L))
  }

  test("rollingAgg horizon boundary is exclusive at exactly horizon seconds") {
    val two = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, 1L, ts("2024-01-02 00:00:00"), 2.0) // exactly 86400s later -> out
    ).toDF("event_id", "user_id", "ts", "value")
    val out = TimeSeriesOps.rollingAgg(two, "user_id", "ts", "value", "event_id", 86400L)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("roll_n")).toMap
    assert(out(2L) == 1L)
  }

  test("rollingAnomaly flags spikes, honors minN, exact moments") {
    // user 1: four 1.0s then a 10.0 spike inside one day (n=5: mean 2.8,
    // std 3.6 -> 10 > 2.8 + 1.5*3.6 = 8.2 -> anomaly); with minN=6 it
    // must NOT flag
    val ev = (1 to 4).map(i =>
      (i.toLong, 1L, ts(s"2024-01-01 0$i:00:00"), 1.0)) :+
      ((5L, 1L, ts("2024-01-01 05:00:00"), 10.0))
    val df = ev.toDF("event_id", "user_id", "ts", "value")
    def flags(minN: Int) =
      TimeSeriesOps.rollingAnomaly(df, "user_id", "ts", "value", "event_id", 86400L, 1.5, minN)
        .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Boolean]("is_anomaly")).toMap
    val f5 = flags(5)
    assert(f5(5L) && !f5(1L) && !f5(4L))
    assert(flags(6).values.forall(!_))
    // exact moments on the spike row: mean 14/5, var = 28.8/5... check mean
    val row = TimeSeriesOps.rollingAnomaly(df, "user_id", "ts", "value", "event_id", 86400L, 1.5, 5)
      .filter($"event_id" === 5L).collect()(0)
    assert(row.getAs[Long]("n") == 5L)
    assert(row.getAs[Double]("roll_mean") == 2.8)
    // var = E[x^2]-mean^2 = (4*1+100)/5 - 7.84 = 20.8 - 7.84 = 12.96; std = 3.6
    assert(row.getAs[Double]("roll_std") == 3.6)
  }

  test("gapFillDaily emits every day in span, zero-counts gaps, forward-fills") {
    val out = TimeSeriesOps.gapFillDaily(events, "user_id", "ts", "value")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day").toString) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("filled_sum")))
      .toMap
    // user 10 spans Jan 1..5 -> 5 rows; Jan 2-4 are gaps carrying Jan 1's sum
    assert(out((10L, "2024-01-01")) == (3L, 7.0))
    assert(out((10L, "2024-01-02")) == (0L, 7.0))
    assert(out((10L, "2024-01-03")) == (0L, 7.0))
    assert(out((10L, "2024-01-04")) == (0L, 7.0))
    assert(out((10L, "2024-01-05")) == (1L, 8.0))
    // user 20: single active day, no gaps
    assert(out((20L, "2024-01-02")) == (1L, 16.0))
    assert(out.size == 6)
  }

  test("ohlc picks open/close under the (ts, id) order, min/max exact") {
    val e = Seq(
      (1L, "a", ts("2024-01-01 10:00:05"), 3.0),
      (2L, "a", ts("2024-01-01 10:30:00"), 9.0),
      (3L, "a", ts("2024-01-01 10:59:59"), 1.0),
      (4L, "a", ts("2024-01-01 11:00:00"), 7.0), // next hour bucket
      (5L, "b", ts("2024-01-01 10:00:05"), 2.0), // same ts as id 6: id breaks tie
      (6L, "b", ts("2024-01-01 10:00:05"), 4.0)
    ).toDF("event_id", "event_type", "ts", "value")
    val out = TimeSeriesOps.ohlc(e, "event_type", "ts", "value", "event_id")
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Timestamp]("hour").toString) ->
        (r.getAs[Double]("open"), r.getAs[Double]("close"),
         r.getAs[Double]("high"), r.getAs[Double]("low"), r.getAs[Long]("n"))).toMap
    assert(out(("a", "2024-01-01 10:00:00.0")) == (3.0, 1.0, 9.0, 1.0, 3L))
    assert(out(("a", "2024-01-01 11:00:00.0")) == (7.0, 7.0, 7.0, 7.0, 1L))
    // equal timestamps: lower event_id opens, higher closes
    assert(out(("b", "2024-01-01 10:00:00.0")) == (2.0, 4.0, 4.0, 2.0, 2L))
  }

  test("debounce keeps exactly each gap-session's first event") {
    val e = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "x"),
      (2L, 1L, ts("2024-01-01 00:20:00"), "x"), // 1200s gap -> same session
      (3L, 1L, ts("2024-01-01 01:00:00"), "y"), // 2400s gap -> new session
      (4L, 2L, ts("2024-01-01 00:00:00"), "x")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val kept = TimeSeriesOps.debounce(e, "user_id", "ts", "event_id", 1800L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("decayedCounts: power-of-two weights, clamped buckets, exact sum") {
    val df = Seq(
      ("s", java.sql.Date.valueOf("2024-01-01")), // age 0 -> w=1
      ("s", java.sql.Date.valueOf("2023-12-01")), // age 31d -> bucket 1 -> 0.5
      ("s", java.sql.Date.valueOf("2023-11-02")), // age 60d -> bucket 2 -> 0.25
      ("s", java.sql.Date.valueOf("2000-01-01")), // ancient -> clamped bucket 20
      ("t", java.sql.Date.valueOf("2024-06-01"))  // future vs ref -> clamped 0 -> 1
    ).toDF("seg", "d")
    val out = TimeSeriesOps.decayedCounts(df, "seg", "d", refDate = "2024-01-01")
      .collect().map(r => r.getAs[String]("seg") ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("decayed_cnt"))).toMap
    assert(out("s") == (4L, 1.0 + 0.5 + 0.25 + math.pow(0.5, 20)))
    assert(out("t") == (1L, 1.0))
  }

  test("cumulativeUniques counts each user once, on their first day") {
    // user 10 first appears 2024-01-01 (three events that day + one later
    // day that must NOT recount); user 20 first appears 2024-01-02
    val out = TimeSeriesOps.cumulativeUniques(events, "user_id", "ts")
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("new_users"), r.getAs[Long]("cum_users"))).toMap
    assert(out == Map(
      "2024-01-01" -> (1L, 1L),
      "2024-01-02" -> (1L, 2L)))
  }

  test("rollingActiveUsers: each active day is visible for exactly k days") {
    // u10 active 01-01 and 01-05; u20 active 01-02; k=3
    val out = TimeSeriesOps.rollingActiveUsers(events, "user_id", "ts", windowDays = 3)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("wau")).toMap
    assert(out == Map(
      "2024-01-01" -> 1L, "2024-01-02" -> 2L, "2024-01-03" -> 2L,
      "2024-01-04" -> 1L, "2024-01-05" -> 1L, "2024-01-06" -> 1L,
      "2024-01-07" -> 1L))
  }

  test("lagFeatures: lag over observed days per entity, null before history") {
    val rows = TimeSeriesOps.lagFeatures(events, "user_id", "ts", "value", Seq(1, 2))
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("day").toString) ->
        (r.getAs[Double]("day_sum"), r.getAs[Long]("n_events"),
          Option(r.getAs[java.lang.Double]("lag1_sum")).map(_.doubleValue()),
          Option(r.getAs[java.lang.Double]("lag2_sum")).map(_.doubleValue()))).toMap
    // user 10: 01-01 has 3 events summing 7.0; next OBSERVED day is 01-05
    assert(rows((10L, "2024-01-01")) == (7.0, 3L, None, None))
    assert(rows((10L, "2024-01-05")) == (8.0, 1L, Some(7.0), None))
    assert(rows((20L, "2024-01-02")) == (16.0, 1L, None, None))
  }

  test("activityStreaks splits on day gaps; same-day repeats count once") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 0.0),
      (2L, 10L, ts("2024-01-01 23:00:00"), 0.0), // same day as e1
      (3L, 10L, ts("2024-01-02 05:00:00"), 0.0),
      (4L, 10L, ts("2024-01-03 00:00:00"), 0.0),
      (5L, 10L, ts("2024-01-05 12:00:00"), 0.0), // gap -> new island
      (6L, 10L, ts("2024-01-06 12:00:00"), 0.0),
      (7L, 20L, ts("2024-01-09 01:00:00"), 0.0)  // singleton island
    ).toDF("event_id", "user_id", "ts", "value")
    val out = TimeSeriesOps.activityStreaks(ev, "user_id", "ts")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("streak_start").toString,
        r.getAs[java.sql.Date]("streak_end").toString,
        r.getAs[Long]("n_days"))).toSet
    assert(out == Set(
      (10L, "2024-01-01", "2024-01-03", 3L),
      (10L, "2024-01-05", "2024-01-06", 2L),
      (20L, "2024-01-09", "2024-01-09", 1L)))
  }

  test("autocorr of a linear daily series is exactly 1 at every lag") {
    // v(day) = day: v and lag(v) are perfectly linearly related on every
    // aligned sub-series, so Pearson corr rounds to exactly 1.0
    val ev = (1 to 12).map(i =>
      (i.toLong, "t", ts(f"2024-01-$i%02d 00:00:00"), i.toDouble))
      .toDF("event_id", "k", "ts", "value")
    val r = TimeSeriesOps.autocorr(ev, "k", "ts", "value", maxLag = 2).collect().head
    assert(r.getAs[Long]("n_days") == 12L)
    assert(r.getAs[Double]("acf_1") == 1.0)
    assert(r.getAs[Double]("acf_2") == 1.0)
  }

  test("autocorr counts a key's days and null-pads lags past history") {
    // 2 observed days, maxLag 3: acf_1 has ONE pair (zero variance ->
    // null/NaN is acceptable only as SQL NULL — Spark corr returns null
    // for n<2 pairs); acf_2/acf_3 have no pairs at all -> null
    val ev = Seq(
      (1L, "t", ts("2024-01-01 00:00:00"), 1.0),
      (2L, "t", ts("2024-01-02 00:00:00"), 2.0)
    ).toDF("event_id", "k", "ts", "value")
    val r = TimeSeriesOps.autocorr(ev, "k", "ts", "value", maxLag = 3).collect().head
    assert(r.getAs[Long]("n_days") == 2L)
    assert(r.isNullAt(r.fieldIndex("acf_2")) && r.isNullAt(r.fieldIndex("acf_3")))
  }

  test("cusum: flat series scores zero everywhere; a level shift accumulates") {
    // days 1-4 at 10.00, days 5-8 at 20.00: n=8, S=12000 cents.
    // residual r_t = 8*v_t - 12000 = -4000 (low days) / +4000 (high days)
    val ev = (1 to 8).map(i =>
      (i.toLong, "t", ts(f"2024-01-0$i 00:00:00"), if (i <= 4) 10.0 else 20.0))
      .toDF("event_id", "k", "ts", "value")
    val out = TimeSeriesOps.cusum(ev, "k", "ts", "value")
      .collect().map(r => r.getAs[java.sql.Date]("d").toString ->
        r.getAs[Long]("cusum_scaled")).toMap
    // below-mean days pin at 0 (running min tracks R); shift days ramp:
    // R after day4 = -16000; days 5..8 add +4000 each → cusum 4000,8000,...
    assert(out("2024-01-01") == 0L && out("2024-01-04") == 0L)
    // (the ±4000 residuals already carry the ×n scaling)
    assert(out("2024-01-05") == 4000L)
    assert(out("2024-01-08") == 16000L)
    val flat = (1 to 5).map(i =>
      (i.toLong, "t", ts(f"2024-01-0$i 00:00:00"), 7.0))
      .toDF("event_id", "k", "ts", "value")
    val z = TimeSeriesOps.cusum(flat, "k", "ts", "value")
      .collect().map(_.getAs[Long]("cusum_scaled"))
    assert(z.forall(_ == 0L))
  }

  test("ewmaDaily: alpha=1/2 fold seeds on day 1 and halves forward exactly") {
    import java.sql.Timestamp
    val rows =
      (1 to 4).map(i => (1L, Timestamp.valueOf(s"2024-01-01 0$i:00:00"), "a")) ++
      (1 to 2).map(i => (1L, Timestamp.valueOf(s"2024-01-02 0$i:00:00"), "a")) ++
      (1 to 8).map(i => (1L, Timestamp.valueOf(s"2024-01-03 0$i:00:00"), "a")) ++
      Seq((1L, Timestamp.valueOf("2024-01-05 01:00:00"), "b"))
    val ev = rows.toDF("user_id", "ts", "event_type")
    val got = graft.ops.TimeSeriesOps.ewmaDaily(ev, "event_type", "ts")
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("ewma"))).toMap
    // a: counts 4, 2, 8 -> (4/2 + 2/2) = 3 -> (3/2 + 8/2) = 5.5 (exact)
    assert(got("a") === ((3L, 5.5)))
    // b: single day -> seed only
    assert(got("b") === ((1L, 1.0)))
  }

  test("holtDaily: two-state dyadic fold, seed (y1, y2-y1), h-step forecast") {
    val rows =
      (1 to 4).map(i => (1L, Timestamp.valueOf(s"2024-01-01 0$i:00:00"), "a")) ++
      (1 to 2).map(i => (1L, Timestamp.valueOf(s"2024-01-02 0$i:00:00"), "a")) ++
      (1 to 8).map(i => (1L, Timestamp.valueOf(s"2024-01-03 0$i:00:00"), "a")) ++
      (1 to 6).map(i => (1L, Timestamp.valueOf(s"2024-01-04 0$i:00:00"), "a")) ++
      (1 to 3).map(i => (1L, Timestamp.valueOf(s"2024-01-01 0$i:00:00"), "c")) ++
      (1 to 7).map(i => (1L, Timestamp.valueOf(s"2024-01-02 0$i:00:00"), "c")) ++
      Seq((1L, Timestamp.valueOf("2024-01-05 01:00:00"), "b"))
    val ev = rows.toDF("user_id", "ts", "event_type")
    val got = graft.ops.TimeSeriesOps.holtDaily(ev, "event_type", "ts")
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_days"), r.getAs[Double]("level"),
          r.getAs[Double]("trend"), r.getAs[Double]("fc_1")))).toMap
    // a: y = 4,2,8,6; seed l=4, b=-2
    //   t3: l = 8/2 + (4-2)/2 = 5;     b = (5-4)/2 + (-2)/2 = -0.5
    //   t4: l = 6/2 + (5-0.5)/2 = 5.25; b = (5.25-5)/2 + (-0.5)/2 = -0.125
    assert(got("a") === ((4L, 5.25, -0.125, 5.125)))
    // c: exactly two days -> the seed IS the state; fc_1 = y2 + (y2-y1)
    assert(got("c") === ((2L, 3.0, 4.0, 7.0)))
    // b: one day -> no trend axis, key absent
    assert(!got.contains("b"))
  }
}
