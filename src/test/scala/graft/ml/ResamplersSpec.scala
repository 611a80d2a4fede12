package graft.ml

import graft.SparkSpecBase
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.functions._

class ResamplersSpec extends SparkSpecBase {
  import spark.implicits._

  // 20 negatives around the origin, 5 positives around (10, 10)
  private lazy val df = (
    (1 to 20).map(i => (i.toLong, Vectors.dense(i % 3 * 0.1, i % 5 * 0.1), 0.0)) ++
      (21 to 25).map(i => (i.toLong, Vectors.dense(10.0 + i % 2 * 0.1, 10.0 + i % 3 * 0.1), 1.0))
  ).toDF("id", "features", "label")

  private def counts(d: org.apache.spark.sql.DataFrame): Map[Double, Long] =
    d.groupBy("label").count().collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap

  test("randomUndersample brings majority near minority size") {
    val c = counts(Resamplers.randomUndersample(df, "label"))
    assert(c(1.0) == 5)
    assert(c(0.0) <= 12) // expected ~5, binomial slack
  }

  test("randomOversample brings minority near majority size, keeps majority whole") {
    val c = counts(Resamplers.randomOversample(df, "label"))
    assert(c(0.0) == 20)
    assert(c(1.0) >= 10)
  }

  test("smote synthesizes minority points on segments between neighbors") {
    val out = Resamplers.smote(df, "id", "label", "features", bucketLength = 5.0)
    val c = counts(out)
    assert(c(1.0) > 5, s"no synthetic rows: $c")
    assert(c(0.0) == 20)
    // synthetic points (id = -1) must lie inside the minority bounding box
    val synth = out.filter(col("id") === -1L).select("features").collect()
      .map(_.getAs[Vector]("features"))
    assert(synth.nonEmpty)
    synth.foreach { v =>
      assert(v(0) >= 10.0 - 1e-9 && v(0) <= 10.2 + 1e-9, s"off-segment x: $v")
      assert(v(1) >= 10.0 - 1e-9 && v(1) <= 10.3 + 1e-9, s"off-segment y: $v")
    }
  }

  test("nearMiss trims majority to minority size, keeps all minority") {
    val c = counts(Resamplers.nearMiss(df, "id", "label", "features", bucketLength = 5.0))
    assert(c(1.0) == 5 && c(0.0) == 5)
  }

  test("nearMiss selection never plans a TakeOrderedAndProject (driver funnel)") {
    val plan = Resamplers.nearMiss(df, "id", "label", "features", bucketLength = 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrderedAndProject"), plan)
  }

  test("resampling is deterministic under a fixed seed") {
    val a = counts(Resamplers.randomOversample(df, "label", seed = 7))
    val b = counts(Resamplers.randomOversample(df, "label", seed = 7))
    assert(a == b)
  }
}
