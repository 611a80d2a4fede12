package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact per-group simple linear regression (OLS y = a·x + b) via
  * order-independent decimal moment sums — the grouped companion to
  * [[StatsOps.corrPairs]]. The reference's feature-exploration stage
  * (Hap880_Final_Project.py:115-180 builds per-category aggregates) stops
  * at counts; a training-data pipeline also wants per-segment trend
  * coefficients, and at 100 TB they must be reproducible: builtin
  * `regr_slope` accumulates doubles whose last digits depend on partition
  * merge order. Here every sum is an exact decimal; the one floating-point
  * formula runs on the final 1-row-per-group moments.
  *
  * Scale shape: ONE hash aggregation computing all five moment sums
  * per group (map-side partial combine), then per-group scalar math —
  * cost is a single scan regardless of group count; no join, no window.
  */
object RegressionOps {

  /** @param cols value columns must carry ≤ 2 decimal places (money /
    *             quantity columns — the decimal(18,2) cast is lossless).
    * Output: (group…, n, slope, intercept, r2), slope/intercept/r2
    * rounded to 9 places; degenerate groups (n < 2 or zero x-variance)
    * yield NULL coefficients rather than an ANSI division error.
    */
  def olsByGroup(df: DataFrame, group: Seq[String], xCol: String, yCol: String): DataFrame = {
    require(group.nonEmpty, "olsByGroup needs at least one grouping column")
    def d(c: String): Column = col(c).cast("decimal(18,2)")
    val m = df.groupBy(group.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(d(xCol)).cast("double").as("_sx"),
      sum(d(yCol)).cast("double").as("_sy"),
      sum((d(xCol) * d(xCol)).cast("decimal(38,4)")).cast("double").as("_sxx"),
      sum((d(yCol) * d(yCol)).cast("decimal(38,4)")).cast("double").as("_syy"),
      sum((d(xCol) * d(yCol)).cast("decimal(38,4)")).cast("double").as("_sxy"))
    val n = col("n").cast("double")
    val cov = n * col("_sxy") - col("_sx") * col("_sy")
    val varX = n * col("_sxx") - col("_sx") * col("_sx")
    val varY = n * col("_syy") - col("_sy") * col("_sy")
    val slope = cov / varX
    val intercept = (col("_sy") - slope * col("_sx")) / n
    val r2 = (cov * cov) / (varX * varY)
    val ok = (col("n") > 1) && (varX > 0)
    m.select(group.map(col) ++ Seq(
      col("n"),
      round(when(ok, slope), 9).as("slope"),
      round(when(ok, intercept), 9).as("intercept"),
      round(when(ok && varY > 0, r2), 9).as("r2")): _*)
  }

  /** DuckDB mirror of [[olsByGroup]] — same moment formulas, same decimal
    * casts, same rounding, so the hash compare is exact. */
  def olsByGroupOracleSql(table: String, group: Seq[String], xCol: String, yCol: String): String = {
    val g = group.mkString(", ")
    s"""WITH m AS (
       |  SELECT $g, COUNT(*) AS n,
       |    CAST(SUM(CAST($xCol AS DECIMAL(18,2))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST($yCol AS DECIMAL(18,2))) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(CAST($xCol AS DECIMAL(18,2)) * CAST($xCol AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(CAST($yCol AS DECIMAL(18,2)) * CAST($yCol AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS syy,
       |    CAST(SUM(CAST(CAST($xCol AS DECIMAL(18,2)) * CAST($yCol AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxy
       |  FROM $table GROUP BY $g
       |)
       |SELECT $g, n,
       |  round(CASE WHEN n > 1 AND (n * sxx - sx * sx) > 0
       |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 9) AS slope,
       |  round(CASE WHEN n > 1 AND (n * sxx - sx * sx) > 0
       |    THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n END, 9) AS intercept,
       |  round(CASE WHEN n > 1 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
       |    THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
       |         ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 9) AS r2
       |FROM m""".stripMargin
  }
}
