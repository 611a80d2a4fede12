package graft.ops

import graft.SparkSpecBase
import java.sql.Timestamp

class FunnelOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  // (event_id, user, type, ts)
  private val events = Seq(
    // u1 completes the funnel in order
    (1L, 1L, "view", ts(1)), (2L, 1L, "click", ts(2)), (3L, 1L, "buy", ts(3)),
    // u2 clicks BEFORE viewing — click must not count, buy (after view but
    // with no qualifying click before it) must not either
    (4L, 2L, "click", ts(1)), (5L, 2L, "view", ts(2)), (6L, 2L, "buy", ts(3)),
    // u3 stalls after click
    (7L, 3L, "view", ts(1)), (8L, 3L, "click", ts(5)),
    // u4 never enters
    (9L, 4L, "buy", ts(1))
  ).toDF("event_id", "user_id", "event_type", "ts")

  test("funnel enforces strict stage order per entity") {
    val out = FunnelOps.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "buy"))
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(out == Map("view" -> 3L, "click" -> 2L, "buy" -> 1L))
  }

  test("windowed funnel drops conversions outside the gap, keeps boundary") {
    // u1: view→click in 1 min, click→buy in 1 min; u3 clicks 4 min after
    // view. With a 2-minute gap u3's click is out; with exactly-4-minutes
    // the boundary is inclusive (<=)
    def counts(gapSec: Long) =
      FunnelOps.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "buy"), maxGapSec = Some(gapSec))
        .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(counts(120L) == Map("view" -> 3L, "click" -> 1L, "buy" -> 1L))
    assert(counts(240L) == Map("view" -> 3L, "click" -> 2L, "buy" -> 1L))
  }

  test("funnel stage counts are monotonically non-increasing") {
    val out = FunnelOps.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "buy"))
      .collect().sortBy(_.getAs[Int]("stage_idx")).map(_.getAs[Long]("n_users"))
    assert(out.zip(out.tail).forall { case (a, b) => b <= a })
  }

  test("retention: every entity is active at week_offset 0 of its own cohort") {
    val out = FunnelOps.retention(events, "user_id", "ts")
    val week0 = out.filter($"week_offset" === 0)
      .agg(org.apache.spark.sql.functions.sum("n_users")).head.getLong(0)
    assert(week0 == 4L) // all four users, single-day data → one cohort cell
    assert(out.count() == 1L)
  }

  test("retention spans week offsets for multi-week activity") {
    val span = Seq(
      (1L, 1L, "view", Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, 1L, "view", Timestamp.valueOf("2024-01-20 10:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = FunnelOps.retention(span, "user_id", "ts")
      .collect().map(r => r.getAs[Int]("week_offset") -> r.getAs[Long]("n_users")).toMap
    assert(out == Map(0 -> 1L, 2 -> 1L)) // day 19 → floor(19/7) = week 2
  }

  test("transitions counts consecutive pairs and nothing else") {
    val out = FunnelOps.transitions(events, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("cnt")).toMap
    // u1: view→click→buy; u2: click→view→buy; u3: view→click
    assert(out == Map(
      ("view", "click") -> 2L, ("click", "buy") -> 1L,
      ("click", "view") -> 1L, ("view", "buy") -> 1L))
    // total transitions = total events − one terminal event per active user
    assert(out.values.sum == 9L - 4L)
  }

  test("lastTouchAttribution credits the most recent in-window touch") {
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    val e = Seq(
      // u1: click then signup then buy → last touch is the signup
      (1L, 1L, "click", t("2024-01-01 10:00:00")),
      (2L, 1L, "signup", t("2024-01-01 10:05:00")),
      (3L, 1L, "buy", t("2024-01-01 10:06:00")),
      // u2: only touch is 8 days before the buy → outside 7d lookback
      (4L, 2L, "view", t("2024-01-01 00:00:00")),
      (5L, 2L, "buy", t("2024-01-09 00:00:01")),
      // u3: no touches at all
      (6L, 3L, "buy", t("2024-01-02 12:00:00")),
      // u4: touch at the SAME second as the buy, smaller id → strictly
      // preceding under the (sec, id) order, so it IS credited
      (7L, 4L, "click", t("2024-01-03 09:00:00")),
      (8L, 4L, "buy", t("2024-01-03 09:00:00")),
      // u5: touch only AFTER the buy → never credited
      (9L, 5L, "buy", t("2024-01-04 08:00:00")),
      (10L, 5L, "click", t("2024-01-04 08:30:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = FunnelOps.lastTouchAttribution(
      e, "user_id", "event_type", "ts", "event_id",
      touchTypes = Seq("view", "click", "signup"), convType = "buy",
      lookbackSec = 7L * 86400L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_conv"), r.getAs[Long]("n_users"))).toMap
    assert(out == Map(
      "signup" -> (1L, 1L),
      "click" -> (1L, 1L),
      "(none)" -> (3L, 3L)))
  }

  test("timeToConvert reports per-channel latency stats for attributed conversions only") {
    // u1: view at :01, buy at :03 → 120 s on 'view'
    // u2: click at :02, buy at :05 → 180 s on 'click'; later buy at :06
    //     (no intervening touch) → 240 s still on 'click'
    // u3: buy with no preceding touch → excluded entirely
    val e = Seq(
      (1L, 1L, "view", ts(1)), (2L, 1L, "buy", ts(3)),
      (3L, 2L, "click", ts(2)), (4L, 2L, "buy", ts(5)), (5L, 2L, "buy", ts(6)),
      (6L, 3L, "buy", ts(4))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = FunnelOps.timeToConvert(
      e, "user_id", "event_type", "ts", "event_id",
      touchTypes = Seq("view", "click"), convType = "buy",
      lookbackSec = 3600L)
      .collect().map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_conv"), r.getAs[Double]("mean_sec"),
          r.getAs[Double]("p50_sec"), r.getAs[Double]("p90_sec")))).toMap
    assert(out("view") == ((1L, 120.0, 120.0, 120.0)))
    assert(out("click")._1 == 2L)
    assert(out("click")._2 == 210.0) // (180 + 240) / 2
    assert(out.size == 2) // the untouched conversion contributes no channel
  }

  test("linearAttribution splits ppm credit equally over in-window touches") {
    // u1 converts after 1 view + 2 clicks → view 333333, click 666666
    // u2 converts with no touch → (none) 1000000
    // u3's view is outside the 1h lookback → (none)
    val e = Seq(
      (1L, 1L, "view", ts(1)), (2L, 1L, "click", ts(2)), (3L, 1L, "click", ts(3)),
      (4L, 1L, "buy", ts(4)),
      (5L, 2L, "buy", ts(1)),
      (6L, 3L, "view", ts(1)), (7L, 3L, "buy", ts(3))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val narrow = FunnelOps.linearAttribution(
      e.filter($"user_id" =!= 3L), "user_id", "event_type", "ts",
      touchTypes = Seq("view", "click"), convType = "buy", lookbackSec = 3600L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(narrow == Map(
      "view" -> (333333L, 1L), "click" -> (666666L, 1L), "(none)" -> (1000000L, 1L)))
    // 61s lookback: u3's view at :01 is 120s before the :03 buy → excluded
    val out3 = FunnelOps.linearAttribution(
      e.filter($"user_id" === 3L), "user_id", "event_type", "ts",
      touchTypes = Seq("view", "click"), convType = "buy", lookbackSec = 61L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out3 == Map("(none)" -> 1000000L))
  }

  test("positionAttribution: 40/20/40 with exact edge cases at k=1 and k=2") {
    // u1: view,click,click,view then buy → k=4: first=view(40%),
    //   last=view(40%), middles 2 clicks × 100000 each → click 200000
    // u2: single click then buy → k=1: click 1000000
    // u3: view,click then buy → k=2: 500000 each
    // u4: bare buy → (none)
    val e = Seq(
      (1L, 1L, "view", ts(1)), (2L, 1L, "click", ts(2)),
      (3L, 1L, "click", ts(3)), (4L, 1L, "view", ts(4)), (5L, 1L, "buy", ts(5)),
      (6L, 2L, "click", ts(1)), (7L, 2L, "buy", ts(2)),
      (8L, 3L, "view", ts(1)), (9L, 3L, "click", ts(2)), (10L, 3L, "buy", ts(3)),
      (11L, 4L, "buy", ts(1))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = FunnelOps.positionAttribution(
      e, "user_id", "event_type", "ts", "event_id",
      touchTypes = Seq("view", "click"), convType = "buy", lookbackSec = 3600L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // view: u1 800000 + u3 500000; click: u1 200000 + u2 1000000 + u3 500000
    assert(out == Map(
      "view" -> (1300000L, 2L),
      "click" -> (1700000L, 3L),
      "(none)" -> (1000000L, 1L)))
  }

  test("positionAttribution resolves same-second first/last ties by event id") {
    // two touches in the SAME second: lower event_id is "first"
    val e = Seq(
      (2L, 1L, "click", ts(1)), (1L, 1L, "view", ts(1)), (3L, 1L, "buy", ts(2))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = FunnelOps.positionAttribution(
      e, "user_id", "event_type", "ts", "event_id",
      touchTypes = Seq("view", "click"), convType = "buy", lookbackSec = 3600L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // k=2 → 50/50, deterministic regardless of row order
    assert(out == Map("view" -> 500000L, "click" -> 500000L))
  }

  test("pathTrigrams counts consecutive per-user 3-step paths, overlapping") {
    // u1: v,c,b → 1 trigram; u2: v,c,v,b → (v,c,v) and (c,v,b);
    // u3: only 2 events → none
    val e = Seq(
      (1L, 1L, "v", ts(1)), (2L, 1L, "c", ts(2)), (3L, 1L, "b", ts(3)),
      (4L, 2L, "v", ts(1)), (5L, 2L, "c", ts(2)), (6L, 2L, "v", ts(3)), (7L, 2L, "b", ts(4)),
      (8L, 3L, "v", ts(1)), (9L, 3L, "b", ts(2))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = FunnelOps.pathTrigrams(e, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getAs[Long]("cnt"))
      .toMap
    assert(out == Map(
      ("v", "c", "b") -> 1L,
      ("v", "c", "v") -> 1L,
      ("c", "v", "b") -> 1L))
  }
}
