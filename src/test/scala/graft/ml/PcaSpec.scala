package graft.ml

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpecBase {
  import spark.implicits._

  test("powerIteration: perfectly correlated pair converges to (0.5, 1), exact") {
    // b = 2a on cents 100/200/300: scatter = 6e4 * [[1,2],[2,4]],
    // dominant eigvec (1,2) -> inf-normalized (0.5, 1), lambda = 3e5.
    // From v0=(1,1) the iteration lands exactly after step 2 (all dyadic).
    val df = Seq((1.00, 2.00), (2.00, 4.00), (3.00, 6.00)).toDF("a", "b")
    val out = Pca.powerIteration(df, Seq("a" -> col("a"), "b" -> col("b")), iters = 5)
      .collect().map(r => r.getAs[Long]("component") ->
        ((r.getAs[Double]("loading"), r.getAs[Double]("lambda")))).toMap
    assert(out(1L) === ((0.5, 300000.0)))
    assert(out(2L) === ((1.0, 300000.0)))
  }

  test("powerIteration: constant features yield a zero scatter and the unit seed") {
    val df = Seq.fill(4)((5.00, 7.00)).toDF("a", "b")
    val out = Pca.powerIteration(df, Seq("a" -> col("a"), "b" -> col("b")), iters = 3)
      .collect().map(r => (r.getAs[Double]("loading"), r.getAs[Double]("lambda")))
    assert(out.toSeq == Seq((1.0, 0.0), (1.0, 0.0)))
  }

  test("powerIteration: the dominant direction follows the high-variance axis") {
    // a has tiny spread, b huge: the loading must be b-dominated
    val df = (1 to 50).map(i => (10.0 + (i % 2) * 0.01, i * 1000.0)).toDF("a", "b")
    val out = Pca.powerIteration(df, Seq("a" -> col("a"), "b" -> col("b")), iters = 12)
      .collect().map(r => r.getAs[Long]("component") -> r.getAs[Double]("loading")).toMap
    assert(math.abs(out(2L)) == 1.0)
    assert(math.abs(out(1L)) < 0.01)
  }
}
