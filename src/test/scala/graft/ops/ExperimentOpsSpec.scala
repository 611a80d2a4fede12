package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions.col

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

  test("srmCheck: an exact 50/50 split reads chi2 = 0, no flag") {
    val pu = (1 to 100).map(i => if (i <= 50) "A" else "B").toDF("arm")
    val r = ExperimentOps.srmCheck(pu, "arm", "A", "B").collect().head
    assert(r.getAs[Long]("n_a") == 50L && r.getAs[Long]("n_b") == 50L)
    assert(r.getAs[Double]("expected_a") == 50.0)
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Long]("srm_flag") == 0L)
  }

  test("srmCheck: a broken 80/20 split flags past the 95% critical value") {
    val pu = (1 to 100).map(i => if (i <= 80) "A" else "B").toDF("arm")
    val r = ExperimentOps.srmCheck(pu, "arm", "A", "B").collect().head
    // chi2 = (80-50)^2/50 + (20-50)^2/50 = 36
    assert(r.getAs[Double]("chi2") == 36.0)
    assert(r.getAs[Long]("srm_flag") == 1L)
  }

  test("srmCheck honors a non-even design ratio") {
    // 90/10 design hit exactly: chi2 = 0 even though the split is lopsided
    val pu = (1 to 100).map(i => if (i <= 90) "A" else "B").toDF("arm")
    val r = ExperimentOps.srmCheck(pu, "arm", "A", "B", ratioA = 0.9).collect().head
    assert(r.getAs[Double]("expected_a") == 90.0)
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Long]("srm_flag") == 0L)
  }

  test("ipwEstimate corrects confounded assignment where the naive diff is biased") {
    // Simpson's-paradox setup: stratum g1 has high outcome rate and mostly
    // treated units; g2 low rate, mostly control. Within each stratum the
    // treatment does NOTHING (same rate both arms) → true ATE = 0, while
    // the naive pooled difference reads positive.
    def rows(s: String, t: Int, y: Int, n: Int) = Seq.fill(n)((s, t, y))
    val df = (
      rows("g1", 1, 1, 80) ++ rows("g1", 1, 0, 80) ++  // treated g1: 50%
        rows("g1", 0, 1, 20) ++ rows("g1", 0, 0, 20) ++ // control g1: 50%
        rows("g2", 1, 1, 10) ++ rows("g2", 1, 0, 90) ++ // treated g2: 10%
        rows("g2", 0, 1, 40) ++ rows("g2", 0, 0, 360)   // control g2: 10%
      ).toDF("s", "t", "y")
    val r = ExperimentOps.ipwEstimate(df, "s", col("t") === 1, col("y") === 1)
      .collect().head
    assert(r.getAs[Long]("n") == 700L)
    assert(r.getAs[Long]("n_used") == 700L)
    assert(r.getAs[Double]("naive_diff") > 0.2, "confounding should bias the naive readout")
    assert(math.abs(r.getAs[Double]("ate_ipw")) < 1e-6, "IPW should recover ATE = 0")
  }

  test("ipwEstimate drops positivity-violating strata and reports n_used") {
    val df = (Seq.fill(10)(("ok", 1, 1)) ++ Seq.fill(10)(("ok", 0, 0)) ++
      Seq.fill(5)(("allt", 1, 1))).toDF("s", "t", "y")
    val r = ExperimentOps.ipwEstimate(df, "s", col("t") === 1, col("y") === 1)
      .collect().head
    assert(r.getAs[Long]("n") == 25L)
    assert(r.getAs[Long]("n_used") == 20L)
    assert(r.getAs[Long]("n_strata") == 2L)
    assert(r.getAs[Double]("ate_ipw") == 1.0)
  }
}
