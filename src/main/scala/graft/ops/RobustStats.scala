package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (median/MAD) statistics and equi-depth binning over exact
  * distributed quantiles. Mean/stddev outlier gates break on the exact
  * data they're meant to catch (the outliers inflate the stddev); the
  * robust form — flag x where |x − median| > k · 1.4826 · MAD — is the
  * standard replacement, and a quality gate for 100 TB training data must
  * be reproducible, so both statistics ride Spark's exact `percentile`
  * aggregate (not `percentile_approx`) and are rounded to 6 places
  * before any threshold comparison: the interpolation arithmetic's last
  * ulp may differ across engines, and a gate must not flip on it.
  *
  * Scale shape: exact percentile shuffles each group's values to its
  * reducer — right for group counts that fit an executor (the usual
  * segment-level gate). For a single giant group use the sketch tier
  * (`a10_approx_quantiles`) instead; same API, bounded memory.
  */
object RobustStats {

  /** Per-group robust outlier summary:
    * (group…, n, med, mad, n_outliers) with med/MAD rounded to 6.
    * Two grouped percentile passes (median, then median-of-deviations)
    * with a join back between them — groups are few, so the stats join
    * broadcasts.
    */
  def madOutliers(df: DataFrame, group: Seq[String], valueCol: String,
                  k: Double = 3.0): DataFrame = {
    require(group.nonEmpty, "madOutliers needs at least one grouping column")
    val v = col(valueCol).cast("double")
    val med = df.groupBy(group.map(col): _*)
      .agg(round(expr(s"percentile($valueCol, 0.5)"), 6).as("med"))
    val withDev = df.join(broadcast(med), group)
      .withColumn("_dev", abs(v - col("med")))
    val mad = withDev.groupBy(group.map(col): _*)
      .agg(round(expr("percentile(_dev, 0.5)"), 6).as("mad"))
    withDev.join(broadcast(mad), group)
      .groupBy((group.map(col) :+ col("med") :+ col("mad")): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("_dev") > lit(k) * lit(1.4826) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
      .select(group.map(col) ++ Seq(col("n"), col("med"), col("mad"), col("n_outliers")): _*)
  }

  /** DuckDB mirror of [[madOutliers]] — quantile_cont matches Spark's
    * `percentile` interpolation; both sides round to 6 before comparing. */
  def madOutliersOracleSql(table: String, group: Seq[String], valueCol: String,
                           k: Double = 3.0): String = {
    val g = group.mkString(", ")
    s"""WITH med AS (
       |  SELECT $g, round(quantile_cont($valueCol, 0.5), 6) AS med FROM $table GROUP BY $g
       |), dev AS (
       |  SELECT t.*, med.med, abs(CAST(t.$valueCol AS DOUBLE) - med.med) AS d
       |  FROM $table t JOIN med USING ($g)
       |), mad AS (
       |  SELECT $g, round(quantile_cont(d, 0.5), 6) AS mad FROM dev GROUP BY $g
       |)
       |SELECT $g, count(*) AS n, med, mad,
       |       CAST(SUM(CASE WHEN d > $k * 1.4826 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       |FROM dev JOIN mad USING ($g)
       |GROUP BY $g, med, mad""".stripMargin
  }

  /** Equi-depth binning: cut a column at its exact quantiles and report
    * per-bin occupancy — the QuantileDiscretizer shape, exact and
    * engine-reproducible. `probs` are the INTERIOR cutpoints (e.g.
    * 0.25/0.5/0.75 for quartiles). Output: (bin, n, min_v, max_v).
    *
    * One global percentile pass produces the (tiny) cutpoint row, which
    * broadcasts onto the scan via a literal-free crossJoin — no shuffle
    * beyond the final small aggregation. Cutpoints round to 6 before the
    * bin comparison for the same cross-engine-ulp reason as above.
    */
  def quantileBins(df: DataFrame, valueCol: String, probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs == probs.sorted, "probs must be ascending")
    val cutsRow = df.agg(
      array(probs.zipWithIndex.map { case (p, i) =>
        round(expr(s"percentile($valueCol, $p)"), 6).as(s"c$i")
      }: _*).as("_cuts"))
    // bin = number of cutpoints strictly below v  (v <= cut_i → bin i)
    val bin = probs.indices.foldLeft(lit(0)) { (acc, i) =>
      acc + when(col("_v") > col("_cuts").getItem(i), 1).otherwise(0)
    }
    df.select(col(valueCol).cast("double").as("_v")).crossJoin(broadcast(cutsRow))
      .select(bin.as("bin"), col("_v"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min("_v").as("min_v"), max("_v").as("max_v"))
  }

  def quantileBinsOracleSql(table: String, valueCol: String, probs: Seq[Double]): String = {
    val cuts = probs.zipWithIndex.map { case (p, i) =>
      s"round(quantile_cont($valueCol, $p), 6) AS c$i"
    }.mkString(", ")
    val binExpr = probs.indices.map { i =>
      s"(CASE WHEN CAST($valueCol AS DOUBLE) > c$i THEN 1 ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH cuts AS (SELECT $cuts FROM $table)
       |SELECT CAST(($binExpr) AS INTEGER) AS bin, count(*) AS n,
       |       MIN(CAST($valueCol AS DOUBLE)) AS min_v,
       |       MAX(CAST($valueCol AS DOUBLE)) AS max_v
       |FROM $table, cuts GROUP BY 1""".stripMargin
  }
}
