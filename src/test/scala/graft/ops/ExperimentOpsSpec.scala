package graft.ops

import graft.SparkSpecBase

class ExperimentOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("cuped: a perfectly-explaining covariate zeroes the adjusted diff") {
    // y = x + 1 exactly in both arms → θ = 1, ρ² = 1, and the raw arm
    // difference (driven entirely by the covariate imbalance) adjusts to 0
    val pu = Seq(
      ("A", 1L, 2L), ("A", 2L, 3L), ("A", 3L, 4L),
      ("B", 0L, 1L), ("B", 1L, 2L), ("B", 2L, 3L)
    ).toDF("arm", "x", "y")
    val r = ExperimentOps.cuped(pu, "arm", "A", "B", "x", "y").collect().head
    assert(r.getAs[Long]("n_t") == 3L && r.getAs[Long]("n_c") == 3L)
    assert(r.getAs[Double]("theta") == 1.0)
    assert(r.getAs[Double]("diff_raw") == 1.0)
    assert(r.getAs[Double]("diff_cuped") == 0.0)
    assert(r.getAs[Double]("var_reduction") == 1.0)
  }

  test("cuped: constant covariate degrades to the raw difference, no ÷0") {
    val pu = Seq(
      ("A", 5L, 4L), ("A", 5L, 2L), ("B", 5L, 1L), ("B", 5L, 3L)
    ).toDF("arm", "x", "y")
    val r = ExperimentOps.cuped(pu, "arm", "A", "B", "x", "y").collect().head
    assert(r.getAs[Double]("theta") == 0.0)
    assert(r.getAs[Double]("diff_cuped") == r.getAs[Double]("diff_raw"))
    assert(r.getAs[Double]("var_reduction") == 0.0)
  }
}
