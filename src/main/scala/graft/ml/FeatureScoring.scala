package graft.ml

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.stat.ChiSquareTest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-scoring operators (reference M13,
  * Hap880_Final_Project.py:633-639): chi-squared via `ml.stat` and a
  * distributed plug-in mutual-information estimator.
  */
object FeatureScoring {

  /** Chi-squared statistics per feature of a Vector column vs a label. */
  def chi2(df: DataFrame, featuresCol: String, labelCol: String): DataFrame = {
    val r = ChiSquareTest.test(df, featuresCol, labelCol).head()
    val stats = r.getAs[Vector]("statistics").toArray
    val pvals = r.getAs[Vector]("pValues").toArray
    val s = org.apache.spark.sql.SparkSession.active
    import s.implicits._
    stats.zip(pvals).zipWithIndex
      .map { case ((st, p), i) => (i, st, p) }.toSeq
      .toDF("feature_idx", "chi2_stat", "p_value")
  }

  /** Pearson chi-squared statistic of a DISCRETE feature column vs the
    * label, computed as a pure DataFrame aggregation over the contingency
    * table: sum over cells of (obs − exp)²/exp with exp = rowTot·colTot/n.
    * Engine-comparable (same formula is plain SQL); `ml.stat.ChiSquareTest`
    * is the Vector-column variant of the same statistic.
    */
  def chi2Contingency(df: DataFrame, featureCol: String, labelCol: String): DataFrame = {
    val joint = df.groupBy(col(featureCol).as("x"), col(labelCol).as("y"))
      .agg(count(lit(1)).as("nxy"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val wx   = org.apache.spark.sql.expressions.Window.partitionBy("x")
    val wy   = org.apache.spark.sql.expressions.Window.partitionBy("y")
    joint
      .withColumn("n", sum("nxy").over(wAll))
      .withColumn("nx", sum("nxy").over(wx))
      .withColumn("ny", sum("nxy").over(wy))
      .withColumn("exp", col("nx").cast("double") * col("ny") / col("n"))
      .withColumn("term", (col("nxy") - col("exp")) * (col("nxy") - col("exp")) / col("exp"))
      // cells the groupBy never saw (nxy = 0) each contribute exactly
      // their expectation: Σ_missing exp = n − Σ_observed exp
      .agg(round(sum("term") + (max("n") - sum("exp")), 6).as("chi2_stat"),
        count(lit(1)).as("n_cells"))
  }

  /** Cramér's V association between two DISCRETE columns — the
    * normalized-to-[0,1] companion of [[chi2Contingency]] (V = √(χ²/(n·
    * min(r−1, c−1)))), the data-card "are these columns related" readout.
    * Same single contingency aggregation; the marginals and distinct
    * counts ride windows over the |cells|-sized table, never the data.
    */
  def cramersV(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("nxy"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val wx   = org.apache.spark.sql.expressions.Window.partitionBy("x")
    val wy   = org.apache.spark.sql.expressions.Window.partitionBy("y")
    joint
      .withColumn("n", sum("nxy").over(wAll))
      .withColumn("nx", sum("nxy").over(wx))
      .withColumn("ny", sum("nxy").over(wy))
      .withColumn("exp", col("nx").cast("double") * col("ny") / col("n"))
      .withColumn("term", (col("nxy") - col("exp")) * (col("nxy") - col("exp")) / col("exp"))
      .agg(
        // unseen (nxy = 0) cells contribute exactly their expectation:
        // Σ_missing exp = n − Σ_observed exp (the full-grid statistic)
        (sum("term") + (max("n") - sum("exp"))).as("_chi2"),
        max("n").as("n"),
        countDistinct("x").as("_r"),
        countDistinct("y").as("_c"))
      .select(
        round(col("_chi2"), 6).as("chi2_stat"),
        col("n"),
        least(col("_r") - 1, col("_c") - 1).as("df_min"),
        round(sqrt(col("_chi2") /
          (col("n") * least(col("_r") - 1, col("_c") - 1))), 6).as("cramers_v"))
  }

  /** Plug-in mutual information I(X;Y) between a DISCRETE column and the
    * label: one groupBy over the joint, driver-side sum over the (tiny)
    * contingency table. For continuous features, bucketize first
    * (QuantileDiscretizer / Recodes.histBucket) — reference discretizes
    * implicitly via sklearn's nearest-neighbor estimator; we pin the
    * plug-in estimate (SURVEY M13: "custom").
    */
  def mutualInfo(df: DataFrame, featureCol: String, labelCol: String): Double = {
    val joint = df
      .groupBy(col(featureCol).as("x"), col(labelCol).as("y"))
      .agg(count(lit(1)).as("nxy"))
      .collect()
    val n = joint.map(_.getLong(2)).sum.toDouble
    val px = joint.groupBy(_.get(0)).map { case (k, rs) => k -> rs.map(_.getLong(2)).sum / n }
    val py = joint.groupBy(_.get(1)).map { case (k, rs) => k -> rs.map(_.getLong(2)).sum / n }
    joint.map { r =>
      val pxy = r.getLong(2) / n
      pxy * math.log(pxy / (px(r.get(0)) * py(r.get(1))))
    }.sum
  }

  /** Mutual information for many discrete feature columns at once —
    * unpivot (stack) + a single joint-count aggregation, so the cost is
    * one shuffle regardless of how many features are scored.
    */
  def mutualInfoAll(df: DataFrame, featureCols: Seq[String], labelCol: String): DataFrame = {
    val stacked = df.select(
      explode(array(featureCols.map(c =>
        struct(lit(c).as("feature"), col(c).cast("string").as("x"))): _*)).as("fx"),
      col(labelCol).cast("string").as("y"))
      .select(col("fx.feature").as("feature"), col("fx.x").as("v"), col("y"))
    mutualInfoFromCounts(
      stacked.groupBy("feature", "v", "y").agg(count(lit(1)).as("nxy")))
  }

  /** Plug-in MI per feature from a PRE-AGGREGATED joint-count frame
    * `(feature, v, y, nxy)` — the wide-matrix path ([[mutualInfoAll]]
    * stacks COLUMNS; at 3,019 features over a sparse matrix the joint is
    * built from the nonzero cells + per-feature zero-completion instead,
    * and this computes the same estimate from those counts). Zero-count
    * cells are ignored (they contribute 0 to the sum). Cardinality:
    * |features| × |values| × |labels| rows in, |features| rows out — the
    * window partitions are bounded by the value-space, never data size.
    * Marginals ride windows, not self-joins: window partitions group
    * NULL category values together (null-safe, matching the driver-side
    * [[mutualInfo]]) where an equi-join would drop every NULL-valued
    * cell from the sum.
    */
  def mutualInfoFromCounts(cells: DataFrame): DataFrame = {
    val wf = org.apache.spark.sql.expressions.Window.partitionBy("feature")
    val wx = org.apache.spark.sql.expressions.Window.partitionBy("feature", "v")
    val wy = org.apache.spark.sql.expressions.Window.partitionBy("feature", "y")
    cells.filter(col("nxy") > 0)
      .withColumn("n", sum("nxy").over(wf))
      .withColumn("nx", sum("nxy").over(wx))
      .withColumn("ny", sum("nxy").over(wy))
      .withColumn("term",
        (col("nxy") / col("n")) *
          log((col("nxy") * col("n")).cast("double") / (col("nx") * col("ny"))))
      .groupBy("feature").agg(sum("term").as("mutual_info"))
  }
}
