package graft.ml

import graft.SparkSpecBase
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.linalg.Vectors

class ResamplerTransformersSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val df = (
    (1 to 20).map(i => (i.toLong, Vectors.dense(i % 3 * 0.1, i % 5 * 0.1), 0.0)) ++
      (21 to 25).map(i => (i.toLong, Vectors.dense(10.0 + i % 2 * 0.1, 10.0 + i % 3 * 0.1), 1.0))
  ).toDF("id", "features", "label")

  private def counts(d: org.apache.spark.sql.DataFrame): Map[Double, Long] =
    d.groupBy("label").count().collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap

  test("Transformer faces delegate to the Resamplers semantics") {
    val rus = new RandomUndersampleTransformer().transform(df)
    assert(counts(rus)(1.0) == 5)
    val smote = new SmoteTransformer().setSeed(42L).transform(df)
    assert(counts(smote)(1.0) > 5)
    val nm = new NearMissTransformer().transform(df)
    assert(counts(nm) == Map(0.0 -> 5L, 1.0 -> 5L))
  }

  test("resampler composes as a Pipeline stage") {
    val pipe = new Pipeline().setStages(Array(new RandomOversampleTransformer()))
    val out = pipe.fit(df).transform(df)
    val c = counts(out)
    assert(c(0.0) == 20 && c(1.0) >= 10)
  }

  test("params survive copy()") {
    val t = new SmoteTransformer().setLabelCol("y").setSeed(7L)
    val c = t.copy(org.apache.spark.ml.param.ParamMap.empty)
      .asInstanceOf[SmoteTransformer]
    assert(c.getOrDefault(c.labelCol) == "y")
    assert(c.getOrDefault(c.seed) == 7L)
  }
}
