package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experiment-analysis operators beyond the plain two-proportion z-test
  * (SparkEntry `ab_ztest`): variance-reduction readouts an A/B platform
  * runs over every metric, every day.
  *
  * Reference scope: the readmission study compares cohort rates directly
  * (`Hap880_Final_Project.py` threshold metrics); a production experiment
  * platform layers covariate adjustment on the same per-unit aggregates.
  */
object ExperimentOps {

  /** CUPED (Controlled-experiment Using Pre-Experiment Data) adjusted
    * treatment-effect readout: with a pre-experiment covariate X per unit
    * and the experiment metric Y, the adjusted metric
    * `Y' = Y − θ·(X − mean(X))` with `θ = cov(X,Y)/var(X)` has the same
    * expected arm difference but variance shrunk by the factor
    * `1 − ρ²(X,Y)` — the standard way to make an experiment read
    * significant days earlier.
    *
    * Input: ONE row per experiment unit with an arm label and integer
    * metrics `xCol` (pre-period) and `yCol` (in-period). Output: one row
    * with per-arm sizes, θ, the raw and CUPED-adjusted arm differences,
    * and the realized variance-reduction factor ρ².
    *
    * Exactness: every aggregate is an exact integer (decimal(38,0)
    * accumulation — no double sum whose low bits depend on partition
    * merge order); the handful of double divisions at the end run in a
    * fixed scalar order, so the result is bit-identical across runs,
    * partitionings, and engines (mirrored token-for-token in the DuckDB
    * oracle). Degenerate pools (constant X or Y) yield θ = 0 / ρ² = 0
    * rather than a divide-by-zero.
    *
    * Scale shape: one hash-aggregation over the per-unit frame to a
    * single row (map-side partial combine); all remaining arithmetic is
    * scalar. The per-unit frame itself is the caller's one shuffle.
    */
  def cuped(
      perUnit: DataFrame, armCol: String, treatArm: String, controlArm: String,
      xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(38,0)")
    val y = col(yCol).cast("decimal(38,0)")
    def armSum(arm: String, c: org.apache.spark.sql.Column) =
      sum(when(col(armCol) === arm, c).otherwise(lit(0).cast("decimal(38,0)")))
    val m = perUnit.agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum((x * y).cast("decimal(38,0)")).as("sxy"),
      sum((x * x).cast("decimal(38,0)")).as("sxx"),
      sum((y * y).cast("decimal(38,0)")).as("syy"),
      sum(when(col(armCol) === treatArm, 1L).otherwise(0L)).as("n_t"),
      armSum(treatArm, x).as("sxt"), armSum(treatArm, y).as("syt"),
      sum(when(col(armCol) === controlArm, 1L).otherwise(0L)).as("n_c"),
      armSum(controlArm, x).as("sxc"), armSum(controlArm, y).as("syc"))
    // scalar double math from exact integer aggregates, fixed op order —
    // the DuckDB oracle repeats these expressions token-for-token
    def d(c: String) = col(c).cast("double")
    val num  = d("n") * d("sxy") - d("sx") * d("sy")
    val denX = d("n") * d("sxx") - d("sx") * d("sx")
    val denY = d("n") * d("syy") - d("sy") * d("sy")
    val theta = when(denX === 0.0, lit(0.0)).otherwise(num / denX)
    val rho2 = when(denX === 0.0 || denY === 0.0, lit(0.0))
      .otherwise((num / denX) * (num / denY))
    val meanXAll = d("sx") / d("n")
    val adjT = d("syt") / d("n_t") - theta * (d("sxt") / d("n_t") - meanXAll)
    val adjC = d("syc") / d("n_c") - theta * (d("sxc") / d("n_c") - meanXAll)
    m.select(
      col("n_t"), col("n_c"),
      round(theta, 6).as("theta"),
      round(d("syt") / d("n_t") - d("syc") / d("n_c"), 6).as("diff_raw"),
      round(adjT - adjC, 6).as("diff_cuped"),
      round(rho2, 6).as("var_reduction"))
  }

  /** DuckDB mirror of [[cuped]] — generated from the same arm labels so
    * the two can't drift; the scalar formulas repeat the Scala op order
    * exactly (doubles are IEEE-deterministic given identical op order).
    *
    * @param perUnitCte SQL producing the per-unit (arm, x, y) frame.
    */
  def cupedOracleSql(perUnitCte: String, treatArm: String, controlArm: String): String =
    s"""WITH pu AS (
       |$perUnitCte
       |), m AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |         CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
       |         CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
       |         CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
       |         CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
       |         CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
       |         SUM(CASE WHEN arm = '$treatArm' THEN 1 ELSE 0 END) AS n_t,
       |         CAST(SUM(CASE WHEN arm = '$treatArm' THEN CAST(x AS HUGEINT) ELSE 0 END) AS DOUBLE) AS sxt,
       |         CAST(SUM(CASE WHEN arm = '$treatArm' THEN CAST(y AS HUGEINT) ELSE 0 END) AS DOUBLE) AS syt,
       |         SUM(CASE WHEN arm = '$controlArm' THEN 1 ELSE 0 END) AS n_c,
       |         CAST(SUM(CASE WHEN arm = '$controlArm' THEN CAST(x AS HUGEINT) ELSE 0 END) AS DOUBLE) AS sxc,
       |         CAST(SUM(CASE WHEN arm = '$controlArm' THEN CAST(y AS HUGEINT) ELSE 0 END) AS DOUBLE) AS syc
       |  FROM pu
       |), s AS (
       |  SELECT *,
       |         n * sxy - sx * sy AS num,
       |         n * sxx - sx * sx AS den_x,
       |         n * syy - sy * sy AS den_y
       |  FROM m
       |), f AS (
       |  SELECT *,
       |         CASE WHEN den_x = 0.0 THEN 0.0 ELSE num / den_x END AS theta,
       |         CASE WHEN den_x = 0.0 OR den_y = 0.0 THEN 0.0
       |              ELSE (num / den_x) * (num / den_y) END AS rho2
       |  FROM s
       |)
       |SELECT CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
       |       round(theta, 6) AS theta,
       |       round(syt / n_t - syc / n_c, 6) AS diff_raw,
       |       round((syt / n_t - theta * (sxt / n_t - sx / n)) -
       |             (syc / n_c - theta * (sxc / n_c - sx / n)), 6) AS diff_cuped,
       |       round(rho2, 6) AS var_reduction
       |FROM f""".stripMargin

  /** Sample-ratio-mismatch (SRM) check: the guardrail every experiment
    * readout runs FIRST — if the realized arm split deviates from the
    * design ratio, the assignment pipeline is broken and every downstream
    * metric is suspect. One-degree-of-freedom chi² against the expected
    * split; `srm_flag = 1` past the 95% critical value (3.841).
    *
    * Input: one row per experiment unit with an arm label. Output one
    * row: (n_a, n_b, expected_a, chi2, srm_flag). Exact integer counts →
    * fixed-order scalar doubles; a single map-side-combined aggregation.
    *
    * @param ratioA designed share of units in `armA` (0 < ratioA < 1).
    */
  def srmCheck(perUnit: DataFrame, armCol: String, armA: String, armB: String,
               ratioA: Double = 0.5): DataFrame = {
    require(ratioA > 0.0 && ratioA < 1.0, s"ratioA in (0,1), got $ratioA")
    val m = perUnit.agg(
      sum(when(col(armCol) === armA, 1L).otherwise(0L)).as("n_a"),
      sum(when(col(armCol) === armB, 1L).otherwise(0L)).as("n_b"))
    def d(c: String) = col(c).cast("double")
    val n = d("n_a") + d("n_b")
    val ea = n * lit(ratioA)
    val eb = n * lit(1.0 - ratioA)
    val chi2 = (d("n_a") - ea) * (d("n_a") - ea) / ea +
      (d("n_b") - eb) * (d("n_b") - eb) / eb
    m.select(
      col("n_a"), col("n_b"),
      round(ea, 6).as("expected_a"),
      round(chi2, 6).as("chi2"),
      when(chi2 > 3.841, 1L).otherwise(0L).as("srm_flag"))
  }

  /** DuckDB mirror of [[srmCheck]] — same counts, same op order.
    * @param perUnitCte SQL producing one `arm` column per unit row.
    */
  def srmOracleSql(perUnitCte: String, armA: String, armB: String,
                   ratioA: Double = 0.5): String =
    s"""WITH pu AS (
       |$perUnitCte
       |), m AS (
       |  SELECT SUM(CASE WHEN arm = '$armA' THEN 1 ELSE 0 END) AS n_a,
       |         SUM(CASE WHEN arm = '$armB' THEN 1 ELSE 0 END) AS n_b
       |  FROM pu
       |), s AS (
       |  SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       |         (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) * $ratioA AS ea,
       |         (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) * ${1.0 - ratioA} AS eb
       |  FROM m
       |)
       |SELECT n_a, n_b, round(ea, 6) AS expected_a,
       |       round((CAST(n_a AS DOUBLE) - ea) * (CAST(n_a AS DOUBLE) - ea) / ea +
       |             (CAST(n_b AS DOUBLE) - eb) * (CAST(n_b AS DOUBLE) - eb) / eb, 6) AS chi2,
       |       CAST(CASE WHEN (CAST(n_a AS DOUBLE) - ea) * (CAST(n_a AS DOUBLE) - ea) / ea +
       |                 (CAST(n_b AS DOUBLE) - eb) * (CAST(n_b AS DOUBLE) - eb) / eb > 3.841
       |            THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
       |FROM s""".stripMargin

  /** Stratified inverse-propensity-weighted treatment-effect estimate
    * (Horvitz–Thompson): with per-stratum propensity
    * `e_s = treated_s / n_s`, the ATE is
    * `(Σ_s pos_treated_s·n_s/treated_s − Σ_s pos_control_s·n_s/control_s)/N`
    * — the observational-data correction a raw arm-mean difference gets
    * wrong when treatment assignment correlates with the stratum.
    * Strata violating positivity (no treated or no control units) are
    * dropped from both sums, and `n_used` reports the surviving size.
    *
    * Output: one row `(n, n_used, n_strata, naive_diff, ate_ipw)`.
    * Per-stratum terms are micro-scaled integers before the final sum,
    * so the estimate is independent of stratum enumeration order.
    *
    * Scale shape: ONE hash-aggregation to the S-row stratum table
    * (map-side combine); everything after is arithmetic over S rows
    * ending in a 1-row aggregate. No second data pass, no driver loop.
    */
  def ipwEstimate(df: DataFrame, stratumCol: String, treated: org.apache.spark.sql.Column,
                  outcome: org.apache.spark.sql.Column): DataFrame = {
    val strata = df
      .groupBy(col(stratumCol).as("s"))
      .agg(
        sum(when(treated, 1L).otherwise(0L)).as("t"),
        sum(when(!treated, 1L).otherwise(0L)).as("c"),
        sum(when(treated && outcome, 1L).otherwise(0L)).as("pos_t"),
        sum(when(!treated && outcome, 1L).otherwise(0L)).as("pos_c"))
      .withColumn("n_s", col("t") + col("c"))
    val ok = col("t") > 0 && col("c") > 0
    // micro-int per-stratum Horvitz–Thompson terms (double division from
    // exact integers, rounded once) — the sum over strata is then exact
    val termT = round(lit(1e6) * col("pos_t").cast("double") * col("n_s").cast("double") /
      col("t").cast("double")).cast("long")
    val termC = round(lit(1e6) * col("pos_c").cast("double") * col("n_s").cast("double") /
      col("c").cast("double")).cast("long")
    strata.agg(
      sum(col("n_s")).as("n"),
      sum(when(ok, col("n_s")).otherwise(0L)).as("n_used"),
      count(lit(1)).as("n_strata"),
      sum(col("t")).as("_nt"), sum(col("c")).as("_nc"),
      sum(col("pos_t")).as("_pt"), sum(col("pos_c")).as("_pc"),
      sum(when(ok, termT).otherwise(0L)).as("_st"),
      sum(when(ok, termC).otherwise(0L)).as("_sc"))
      .select(
        col("n"), col("n_used"), col("n_strata"),
        round(col("_pt").cast("double") / col("_nt").cast("double") -
          col("_pc").cast("double") / col("_nc").cast("double"), 9).as("naive_diff"),
        round((col("_st") - col("_sc")).cast("double") /
          (lit(1e6) * col("n_used").cast("double")), 9).as("ate_ipw"))
  }

  /** DuckDB mirror of [[ipwEstimate]]: `rowsCte` must yield columns
    * `(s, is_t, y)` with `is_t`/`y` 0/1 integers.
    */
  def ipwOracleSql(rowsCte: String): String =
    s"""WITH rows_in AS (
       |$rowsCte
       |), st AS (
       |  SELECT s,
       |         CAST(SUM(is_t) AS BIGINT) AS t,
       |         CAST(SUM(1 - is_t) AS BIGINT) AS c,
       |         CAST(SUM(CASE WHEN is_t = 1 THEN y ELSE 0 END) AS BIGINT) AS pos_t,
       |         CAST(SUM(CASE WHEN is_t = 0 THEN y ELSE 0 END) AS BIGINT) AS pos_c,
       |         CAST(COUNT(*) AS BIGINT) AS n_s
       |  FROM rows_in GROUP BY 1
       |)
       |SELECT CAST(SUM(n_s) AS BIGINT) AS n,
       |       CAST(SUM(CASE WHEN t > 0 AND c > 0 THEN n_s ELSE 0 END) AS BIGINT) AS n_used,
       |       CAST(COUNT(*) AS BIGINT) AS n_strata,
       |       round(CAST(SUM(pos_t) AS DOUBLE) / CAST(SUM(t) AS DOUBLE) -
       |             CAST(SUM(pos_c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 9) AS naive_diff,
       |       round(CAST(SUM(CASE WHEN t > 0 AND c > 0
       |                    THEN CAST(round(1e6 * CAST(pos_t AS DOUBLE) * CAST(n_s AS DOUBLE) / CAST(t AS DOUBLE)) AS BIGINT)
       |                    ELSE 0 END) -
       |                  SUM(CASE WHEN t > 0 AND c > 0
       |                    THEN CAST(round(1e6 * CAST(pos_c AS DOUBLE) * CAST(n_s AS DOUBLE) / CAST(c AS DOUBLE)) AS BIGINT)
       |                    ELSE 0 END) AS DOUBLE) /
       |             (1e6 * CAST(SUM(CASE WHEN t > 0 AND c > 0 THEN n_s ELSE 0 END) AS DOUBLE)), 9) AS ate_ipw
       |FROM st""".stripMargin
}
