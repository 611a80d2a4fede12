package graft.ml

import graft.SparkSpecBase

class MetricsSpec extends SparkSpecBase {
  import spark.implicits._

  // scores with a tie straddling classes: AUC must use average ranks
  private val scored = Seq(
    (0.9, 1.0), (0.8, 1.0), (0.7, 0.0), (0.6, 1.0),
    (0.6, 0.0), (0.4, 0.0), (0.3, 0.0), (0.2, 1.0)
  ).toDF("score", "y")

  test("aucRoc matches the hand-computed Mann-Whitney value with ties") {
    // ranks asc: 0.2->1, 0.3->2, 0.4->3, 0.6->{4,5}->4.5 each, 0.7->6, 0.8->7, 0.9->8
    // pos ranks: 8 + 7 + 4.5 + 1 = 20.5; AUC = (20.5 - 4*5/2) / (4*4) = 10.5/16
    val auc = Metrics.aucRoc(scored, "score", "y")
    assert(math.abs(auc - 10.5 / 16.0) < 1e-12)
  }

  test("perfect and inverted separations give AUC 1 and 0") {
    val perfect = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0)).toDF("score", "y")
    assert(Metrics.aucRoc(perfect, "score", "y") == 1.0)
    val inverted = Seq((0.1, 1.0), (0.2, 1.0), (0.8, 0.0), (0.9, 0.0)).toDF("score", "y")
    assert(Metrics.aucRoc(inverted, "score", "y") == 0.0)
  }

  test("single-class input gives AUC 0.0, never NaN") {
    val onlyPos = Seq((0.9, 1.0), (0.4, 1.0)).toDF("score", "y")
    assert(Metrics.aucRoc(onlyPos, "score", "y") == 0.0)
    val onlyNeg = Seq((0.9, 0.0), (0.4, 0.0)).toDF("score", "y")
    assert(Metrics.aucRoc(onlyNeg, "score", "y") == 0.0)
  }

  test("thresholdMetrics counts and ratios at 0.5") {
    val m = Metrics.thresholdMetrics(scored, "score", "y", 0.5).collect()(0)
    assert(m.getAs[Long]("tp") == 3 && m.getAs[Long]("fp") == 2)
    assert(m.getAs[Long]("tn") == 2 && m.getAs[Long]("fn") == 1)
    assert(m.getAs[Double]("accuracy") == 5.0 / 8)
    assert(m.getAs[Double]("recall") == 3.0 / 4)
  }

  test("thresholdMetrics is 0-safe when a class is empty") {
    val allNeg = Seq((0.1, 0.0), (0.2, 0.0)).toDF("score", "y")
    val m = Metrics.thresholdMetrics(allNeg, "score", "y", 0.5).collect()(0)
    assert(m.getAs[Double]("recall") == 0.0)
    assert(m.getAs[Double]("precision_") == 0.0)
  }

  test("ConfusionAggregator one-pass counters match the agg form") {
    val ds = scored.as[(Double, Double)]
    val c = ds.select(new Metrics.ConfusionAggregator(0.5).toColumn).collect()(0)
    assert(c == Metrics.Confusion(3, 2, 2, 1))
    assert(c.f1 == 2 * (3.0 / 5) * (3.0 / 4) / ((3.0 / 5) + (3.0 / 4)))
  }

  test("rocPoints is monotone and ends at (1,1)") {
    val pts = Metrics.rocPoints(scored, "score", "y")
      .orderBy("fpr", "tpr").collect()
    val fprs = pts.map(_.getAs[Double]("fpr")).toSeq
    val tprs = pts.map(_.getAs[Double]("tpr")).toSeq
    assert(fprs == fprs.sorted && tprs == tprs.sorted)
    assert(fprs.last == 1.0 && tprs.last == 1.0)
  }
}
