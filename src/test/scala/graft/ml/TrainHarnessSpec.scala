package graft.ml

import graft.SparkSpecBase
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

class TrainHarnessSpec extends SparkSpecBase {
  import spark.implicits._

  // linearly separable-ish: label follows x0 with some noise-free margin
  private lazy val df = (
    (1 to 30).map(i => (i.toLong, Vectors.dense(i * 0.1, (i % 3) * 0.2), 0.0)) ++
      (31 to 60).map(i => (i.toLong, Vectors.dense(3.0 + i * 0.1, (i % 5) * 0.1), 1.0))
  ).toDF("id", "features", "label")

  test("logisticL1Margins: margin sign agrees with probability threshold (M15)") {
    val scored = TrainHarness.logisticL1Margins(df, df, "features", "label")
    val rows = scored.select("margin", "score").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val margin = r.getDouble(0); val p = r.getDouble(1)
      assert((margin > 0) == (p > 0.5), s"margin=$margin p=$p")
      // margin is the log-odds: sigmoid(margin) == probability
      assert(math.abs(1.0 / (1.0 + math.exp(-margin)) - p) < 1e-6)
    }
  }
}
