package graft.ops

import graft.SparkSpecBase
import java.sql.Timestamp

class CohortOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (entity, event_id, time, type)
  private val rows = Seq(
    // patient 1: emergency -> elective -> emergency; the elective next
    // event must be SKIPPED and the later emergency must count instead
    (1L, 10L, ts("2000-01-01 00:00:00"), "EMERGENCY"),
    (1L, 11L, ts("2000-01-10 00:00:00"), "ELECTIVE"),
    (1L, 12L, ts("2000-01-20 00:00:00"), "EMERGENCY"),
    // patient 2: next event beyond the 30-day horizon
    (2L, 20L, ts("2000-01-01 00:00:00"), "EMERGENCY"),
    (2L, 21L, ts("2000-03-15 00:00:00"), "EMERGENCY"),
    // patient 3: single event, no next
    (3L, 30L, ts("2000-01-01 00:00:00"), "URGENT")
  )

  private lazy val labeled = CohortOps
    .labelNextEvent(
      rows.toDF("entity", "event_id", "time", "etype"),
      entityCol = "entity", timeCol = "time", typeCol = "etype",
      tieCol = "event_id", excludedType = "ELECTIVE", horizonDays = 30.0
    )
    .collect()
    .map(r => r.getAs[Long]("event_id") -> r)
    .toMap

  test("elective next event is skipped; the one after it counts") {
    val r = labeled(10L)
    assert(r.getAs[Timestamp]("next_time") == ts("2000-01-20 00:00:00"))
    assert(r.getAs[String]("next_type") == "EMERGENCY")
    assert(r.getAs[Double]("days_next") == 19.0)
    assert(r.getAs[String]("label") == "1")
  }

  test("event beyond horizon labels '0' with correct fractional days") {
    val r = labeled(20L)
    assert(r.getAs[Double]("days_next") == 74.0)
    assert(r.getAs[String]("label") == "0")
  }

  test("no next event: null next_time, null days, label '0' (NaN<30 is false)") {
    val r = labeled(30L)
    assert(r.getAs[Timestamp]("next_time") == null)
    assert(r.getAs[Any]("days_next") == null)
    assert(r.getAs[String]("label") == "0")
  }

  test("elective event itself still gets its own next (backfill from suffix)") {
    val r = labeled(11L)
    // event 11's lead is event 12 (EMERGENCY) — not excluded, kept directly
    assert(r.getAs[Timestamp]("next_time") == ts("2000-01-20 00:00:00"))
    assert(r.getAs[String]("label") == "1")
  }

  test("last event of an excluded-next chain backfills across multiple electives") {
    import org.apache.spark.sql.functions.col
    val chain = Seq(
      (9L, 90L, ts("2000-01-01 00:00:00"), "EMERGENCY"),
      (9L, 91L, ts("2000-01-05 00:00:00"), "ELECTIVE"),
      (9L, 92L, ts("2000-01-08 00:00:00"), "ELECTIVE"),
      (9L, 93L, ts("2000-02-20 00:00:00"), "URGENT")
    ).toDF("entity", "event_id", "time", "etype")
    val out = CohortOps
      .labelNextEvent(chain, "entity", "time", "etype", "event_id", "ELECTIVE", 30.0)
      .filter(col("event_id") === 90L)
      .collect()(0)
    // both electives skipped; next non-elective is Feb 20 → 50 days → '0'
    assert(out.getAs[Timestamp]("next_time") == ts("2000-02-20 00:00:00"))
    assert(out.getAs[String]("label") == "0")
  }
}
