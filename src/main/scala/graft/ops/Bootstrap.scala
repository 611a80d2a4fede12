package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Distributed Poisson bootstrap — confidence intervals for a metric in
  * ONE pass over the data, no resampling shuffles. Instead of drawing B
  * bootstrap samples (impossible at 100 TB), each row gets B independent
  * Poisson(1) weights; replicate b's estimate is the w-weighted metric.
  * For n → ∞ the Poisson(1) weight vector is indistinguishable from a
  * multinomial bootstrap draw — the standard trick for CIs on massive
  * data.
  *
  * Determinism: the Poisson draw is an inverse-CDF lookup on a uniform
  * built from the engine-portable 60-bit md5 hash of (row key, replicate,
  * salt) — the same construction both engines can evaluate, so even the
  * "random" weights are hash-checked in the DuckDB oracle. No RNG stream,
  * no seed-order dependence, resumable.
  *
  * Reference analogue: the reference reports point metrics only
  * (Hap880_Final_Project.py:520-545); this adds the uncertainty a
  * decision on 100 TB actually needs.
  */
object Bootstrap {

  /** Poisson(1) CDF thresholds scaled to the hash's 1e-6 grid: weight =
    * #{k : u ≥ P(X ≤ k)}, capped at 8 (P(X > 8) < 1e-6 — below the grid).
    */
  private val PoissonCdfMicro: Seq[Long] = Seq(
    367879L, 735759L, 919699L, 981012L, 996340L, 999406L, 999917L, 999990L)

  private def weight(u: Column): Column =
    PoissonCdfMicro.map(c => when(u >= c, 1).otherwise(0)).reduce(_ + _)

  /** Bootstrap mean of a 0/1 (or small-integer) outcome: emits one row
    * `(n, b, est_mean, boot_mean, boot_se)` — the point estimate, the
    * mean of the B replicate estimates, and their sample standard
    * deviation (the bootstrap standard error).
    *
    * Scale shape: a `B`-way explode (map-side, no shuffle) feeds ONE hash
    * aggregation keyed by replicate (B rows out, partial combine), then a
    * 1-row aggregate over those B rows. Replicate estimates are
    * micro-scaled integers before any cross-replicate sum, so the CI is
    * bit-identical across partitionings and engines.
    */
  def poissonMeanCi(df: DataFrame, key: Column, y: Column, b: Int = 32,
                    salt: String = ":bs"): DataFrame = {
    require(b >= 2, s"need ≥ 2 replicates for a standard error; got $b")
    val reps = df
      .select(key.cast("string").as("_k"), y.cast("long").as("_y"))
      .select(col("_k"), col("_y"), explode(sequence(lit(0), lit(b - 1))).as("_b"))
      .select(col("_b"), col("_y"),
        weight(pmod(TextOps.md5Hash60(concat(col("_k"), lit(salt), col("_b").cast("string"))),
          lit(1000000L))).cast("long").as("_w"))
      .groupBy("_b")
      .agg(sum(col("_w") * col("_y")).as("_wy"), sum(col("_w")).as("_w"))
      // replicate estimate, micro-scaled: round(1e6 · Σwy / Σw)
      .select(round(lit(1e6) * col("_wy").cast("double") / col("_w").cast("double"))
        .cast("long").as("_m"))
    val est = df.agg(count(lit(1)).as("n"), sum(y.cast("long")).as("_pos"))
    val boot = reps.agg(
      count(lit(1)).as("b"),
      sum("_m").as("_sm"),
      sum((col("_m").cast("decimal(19,0)") * col("_m").cast("decimal(19,0)"))
        .cast("decimal(38,0)")).cast("double").as("_smm"))
    val bD = col("b").cast("double")
    val smD = col("_sm").cast("double")
    est.crossJoin(boot).select(
      col("n"), col("b"),
      round(col("_pos").cast("double") / col("n").cast("double"), 9).as("est_mean"),
      round(smD / (bD * 1e6), 9).as("boot_mean"),
      round(sqrt((bD * col("_smm") - smD * smD) / (bD * (bD - 1.0))) / 1e6, 9).as("boot_se"))
  }

  /** DuckDB mirror of [[poissonMeanCi]]: `rowsCte` must yield `(k, y)`
    * with `k` a VARCHAR row key and `y` an integer outcome.
    */
  def poissonMeanCiOracleSql(rowsCte: String, b: Int = 32, salt: String = ":bs"): String = {
    val wSql = PoissonCdfMicro
      .map(c => s"(CASE WHEN u >= $c THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH rows_in AS (
       |$rowsCte
       |), ex AS (
       |  SELECT k, y, unnest(range(0, $b)) AS rb FROM rows_in
       |), wts AS (
       |  SELECT rb, y,
       |         CAST($wSql AS BIGINT) AS w
       |  FROM (
       |    SELECT rb, y,
       |           CAST(concat('0x', substr(md5(concat(k, '$salt', CAST(rb AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000 AS u
       |    FROM ex
       |  )
       |), reps AS (
       |  SELECT CAST(round(1e6 * CAST(SUM(w * y) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)) AS BIGINT) AS m
       |  FROM wts GROUP BY rb
       |), boot AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS b, SUM(m) AS sm, SUM(m * m) AS smm FROM reps
       |), est AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos FROM rows_in
       |)
       |SELECT n, b,
       |       round(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 9) AS est_mean,
       |       round(CAST(sm AS DOUBLE) / (CAST(b AS DOUBLE) * 1e6), 9) AS boot_mean,
       |       round(sqrt((CAST(b AS DOUBLE) * CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)) /
       |                  (CAST(b AS DOUBLE) * (CAST(b AS DOUBLE) - 1.0))) / 1e6, 9) AS boot_se
       |FROM est, boot""".stripMargin
  }
}
