package graft.ops

import graft.SparkSpecBase

class RegressionOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("olsByGroup recovers exact coefficients on noiseless linear data") {
    val df = (1 to 50).flatMap { i =>
      Seq(("g1", i.toDouble, 2.0 * i + 5.0), ("g2", i.toDouble, -0.5 * i + 10.0))
    }.toDF("g", "x", "y")
    val out = RegressionOps.olsByGroup(df, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("slope"), r.getAs[Double]("intercept"), r.getAs[Double]("r2")))).toMap
    assert(out("g1") == ((2.0, 5.0, 1.0)))
    assert(out("g2") == ((-0.5, 10.0, 1.0)))
  }

  test("olsByGroup yields NULL coefficients for degenerate groups") {
    val df = Seq(
      ("solo", 1.0, 2.0),                    // n = 1
      ("flat", 3.0, 1.0), ("flat", 3.0, 9.0) // zero x-variance
    ).toDF("g", "x", "y")
    val out = RegressionOps.olsByGroup(df, Seq("g"), "x", "y").collect()
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("slope")), s"group ${r.getString(0)}")
      assert(r.isNullAt(r.fieldIndex("intercept")))
      assert(r.isNullAt(r.fieldIndex("r2")))
    }
  }

  test("olsByGroup is invariant to partitioning (exact moment accumulation)") {
    val base = (1 to 400).map(i => ("g", (i * 13 % 97).toDouble, (i * 29 % 83 + i % 11).toDouble))
    def run(parts: Int) = RegressionOps.olsByGroup(
        base.toDF("g", "x", "y").repartition(parts), Seq("g"), "x", "y")
      .collect().head
    val a = run(1); val b = run(13)
    assert(a.getAs[Double]("slope") == b.getAs[Double]("slope"))
    assert(a.getAs[Double]("intercept") == b.getAs[Double]("intercept"))
    assert(a.getAs[Double]("r2") == b.getAs[Double]("r2"))
  }
}
