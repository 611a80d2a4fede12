package graft.ml

import graft.SparkSpecBase

class FeatureScoringVSpec extends SparkSpecBase {
  import spark.implicits._

  test("cramersV is 1 for a perfect association and ~0 for independence") {
    val perfect = Seq.tabulate(60)(i => (s"x${i % 3}", s"y${i % 3}"))
      .toDF("a", "b")
    val p = FeatureScoring.cramersV(perfect, "a", "b").collect().head
    assert(p.getAs[Double]("cramers_v") == 1.0)
    assert(p.getAs[Long]("df_min") == 2L)
    // independent uniform grid: every (x, y) cell equally filled → chi2 = 0
    val indep = (for (x <- 0 until 3; y <- 0 until 4; _ <- 0 until 5)
      yield (s"x$x", s"y$y")).toDF("a", "b")
    val q = FeatureScoring.cramersV(indep, "a", "b").collect().head
    assert(q.getAs[Double]("chi2_stat") == 0.0)
    assert(q.getAs[Double]("cramers_v") == 0.0)
  }
}
