package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SurvivalSpec extends SparkSpecBase {
  import spark.implicits._

  // classic hand-checkable cohort: durations with events and censorings
  private def subjects = Seq(
    (1L, true), (2L, true), (2L, false), (4L, true), (5L, false), (5L, true)
  ).toDF("dur", "ev")

  test("kmTable risk counts match the hand-computed table") {
    val out = Survival.kmTable(subjects, col("dur"), col("ev"))
      .collect()
      .map(r => r.getAs[Long]("t") ->
        ((r.getAs[Long]("n_risk"), r.getAs[Long]("n_event"), r.getAs[Long]("n_censor"))))
      .toMap
    assert(out(1L) == ((6L, 1L, 0L))) // everyone at risk at the first time
    assert(out(2L) == ((5L, 1L, 1L)))
    assert(out(4L) == ((3L, 1L, 0L)))
    assert(out(5L) == ((2L, 1L, 1L)))
  }

  test("kmTable invariants: n_risk strictly decreasing, exits account for everyone") {
    val rows = Survival.kmTable(subjects, col("dur"), col("ev"))
      .orderBy("t").collect()
    val risks = rows.map(_.getAs[Long]("n_risk"))
    assert(risks.zip(risks.tail).forall { case (a, b) => a > b })
    assert(rows.map(r => r.getAs[Long]("n_event") + r.getAs[Long]("n_censor")).sum == 6L)
    // at-risk at t equals everyone exiting at or after t
    rows.foreach { r =>
      val t = r.getAs[Long]("t")
      val tail = rows.filter(_.getAs[Long]("t") >= t)
        .map(x => x.getAs[Long]("n_event") + x.getAs[Long]("n_censor")).sum
      assert(r.getAs[Long]("n_risk") == tail)
    }
  }
}
