package graft.pipeline

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The §3.3 training surface at the reference's own scale: the
  * 45,059 × 3,019 matrix trains, the resampling story reproduces, and
  * the AUCs land in the reference's published band (BASELINE.md "Model
  * quality": base LR 0.501, RandomUnderSampler 0.640 — imbalance kills
  * the base model, undersampling rescues the text signal).
  */
class MimicTrainSpec extends SparkSpecBase {
  import spark.implicits._

  test("MIMIC-scale matrix: 45,059 rows, 3,019-wide vectors (the reference's shape)") {
    val full = MimicPipeline.assembled(spark)
    assert(full.count() == 45059L)
    val width = full.select("features").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0).size
    assert(width == 3019, s"vector width $width != 3,019 (3,000 BoW + 17 diag + age + gender)")
  }

  test("base vs undersampled LR reproduces the reference's resampling finding") {
    val full = MimicPipeline.assembled(spark)
    val train = full.filter(col("split") === "train").select("id", "features", "label")
    val test = full.filter(col("split") === "test").select("id", "features", "label")
    // sklearn-faithful regularization: λ = 1/(n·C) at the CV-winning
    // C = 0.01 (what cell 66's GridSearchCV lands on for both rows)
    val nBase = train.count()
    val baseScored = graft.ml.TrainHarness.logisticL1Scores(
      train, test, "features", "label", regParam = 1.0 / (nBase * 0.01)).cache()
    val under = graft.ml.Resamplers.randomUndersample(train, "label", 42L)
    // fraction-based sampling lands NEAR the reference's exact 4,720
    // balanced-train golden (the exact identity is the green
    // mimic_resample_counts row; the sampled membership is the RNG
    // surface, per SURVEY §5)
    val n = under.count()
    assert(math.abs(n - 4720L) < 150, s"balanced train size $n far from 4,720")
    val underScored = graft.ml.TrainHarness.logisticL1Scores(
      under, test, "features", "label", regParam = 1.0 / (n * 0.01)).cache()
    // the PUBLISHED metric (cell 66's roc_curve on binary predictions =
    // (recall+specificity)/2): base 0.501 — the imbalanced fit predicts
    // ~all-negative at threshold 0.5 — vs undersampled 0.640, where the
    // balanced train makes the signal actionable at 0.5
    val basePred = graft.ml.Metrics.aucRocFromPredictions(baseScored, "score", "label")
    val underPred = graft.ml.Metrics.aucRocFromPredictions(underScored, "score", "label")
    assert(basePred > 0.47 && basePred < 0.56,
      s"base predicted-auc $basePred outside the reference's 0.501 band")
    assert(underPred > 0.58 && underPred < 0.72,
      s"undersampled predicted-auc $underPred outside the reference's 0.640 band")
    assert(underPred > basePred, "undersampling must beat base on the published metric")
    // and the probability RANKING stays informative on both (the engine's
    // sanity check — the reference never published these)
    val underAuc = graft.ml.Metrics.aucRoc(underScored, "score", "label")
    assert(underAuc > 0.55 && underAuc < 0.80, s"undersampled ranking AUC $underAuc")
    baseScored.unpersist(); underScored.unpersist()
  }

  test("RF on the undersampled MIMIC-scale train lands in the reference's AUC band") {
    val full = MimicPipeline.assembled(spark)
    val train = full.filter(col("split") === "train").select("id", "features", "label")
    val test = full.filter(col("split") === "test").select("id", "features", "label")
    val under = graft.ml.Resamplers.randomUndersample(train, "label", 42L)
    val aucs = graft.ml.TrainHarness.rfSweep(under, test, "features", "label", Seq(300))
      .collect().map(r => r.getAs[Int]("num_trees") -> r.getAs[Double]("auc_roc")).toMap
    // reference: 0.695 at n=300 on real notes; the synthetic signal
    // supports the same qualitative story — well above chance, below
    // the LR-with-the-exact-vocabulary ceiling
    assert(aucs(300) > 0.55 && aucs(300) < 0.75, s"RF AUC ${aucs(300)} outside the band")
  }
}
