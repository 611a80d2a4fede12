package graft.pipeline

import graft.core.Tables
import graft.ml.{Features, Metrics, Resamplers, TrainHarness}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's complete flow, §3.1 + §3.2 + §3.3
  * (Hap880_Final_Project.py:19-534), composed end-to-end on the test
  * schema:
  *
  *   1. cohort labeling — per-entity lead/skip/backfill windows → 30-day
  *      label (orders as admissions; '5-LOW' as ELECTIVE)
  *   2. category feature matrix — per-order explode→pivot counts
  *      (lineitem return flags as the diagnosis-category analog of the
  *      admission×17 ICD matrix)
  *   3. text features — per-"entity" document tokens (documents table
  *      keyed to orders by modulus as the notes analog)
  *   4. join-everything feature table → train/test split → resample →
  *      L1 LR → AUC + threshold metrics
  *
  * One library call = the whole notebook. Every stage is the library
  * operator, so the composition inherits each stage's plan shape (single
  * cohort exchange, literal pivot values, broadcast dims).
  */
object ReadmissionPipeline {

  /** §3.2 analog: per-order pivot-count matrix over lineitem return
    * flags (explicit pivot values — no distinct-values pre-job).
    */
  def categoryMatrix(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .pivot("l_returnflag", Seq("A", "N", "R")).agg(count(lit(1)))
      .na.fill(0, Seq("A", "N", "R"))
      .withColumnRenamed("A", "cat_a")
      .withColumnRenamed("N", "cat_n")
      .withColumnRenamed("R", "cat_r")

  /** §3.1+§3.2 composed feature table: cohort-labeled, scaled numeric/
    * one-hot features CONCATENATED with the category-matrix counts — the
    * join alone would leave the category counts as dead columns the
    * trainer never sees (vector width = Features.featureCols ++ 3 cats,
    * pinned in ReadmissionFixtureSpec).
    */
  def featureTable(s: SparkSession, dir: String): DataFrame = {
    // Features.assembled computes the cohort labels internally (same
    // labelNextEvent windows) and is session-memoized
    val base = Features.assembled(s, dir)
    val cats = categoryMatrix(s, dir)
    val joined = base
      .join(cats.withColumnRenamed("l_orderkey", "id"), Seq("id"), "left")
      .na.fill(0, Seq("cat_a", "cat_n", "cat_r"))
      .withColumn("cat_a", col("cat_a").cast("double"))
      .withColumn("cat_n", col("cat_n").cast("double"))
      .withColumn("cat_r", col("cat_r").cast("double"))
    new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("features", "cat_a", "cat_n", "cat_r"))
      .setOutputCol("_full")
      .transform(joined)
      .drop("features").withColumnRenamed("_full", "features")
      .select("id", "features", "label")
  }

  /** Full composed pipeline → one metrics row per resampling strategy. */
  def run(s: SparkSession, dir: String, seed: Long = 42L): DataFrame = {
    val full = featureTable(s, dir)

    // 4. split → resample → train → metrics (§3.3)
    val (train, test) = Features.splitByHash(full, "id")
    val strategies = Seq(
      "base"        -> train,
      "undersample" -> Resamplers.randomUndersample(train, "label", seed),
      "oversample"  -> Resamplers.randomOversample(train, "label", seed))
    import s.implicits._
    strategies.map { case (name, resampled) =>
      // two metric actions per strategy — cache the scored frame so the
      // LR transform (and the feature-table work above it) runs once
      val scored = TrainHarness.logisticL1Scores(resampled, test, "features", "label").cache()
      val auc = Metrics.aucRoc(scored, "score", "label")
      val m = Metrics.thresholdMetrics(scored, "score", "label", 0.5).collect()(0)
      scored.unpersist()
      (name, auc, m.getAs[Double]("accuracy"), m.getAs[Double]("recall"),
        m.getAs[Double]("precision_"), m.getAs[Double]("specificity"),
        m.getAs[Long]("tp") + m.getAs[Long]("fn"))
    }.toDF("strategy", "auc_roc", "accuracy", "recall", "precision_", "specificity", "n_pos_test")
  }
}
