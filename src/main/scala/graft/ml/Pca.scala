package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact dominant principal component via power iteration over the
  * EXACT-INTEGER scatter matrix — distributed linear algebra with a
  * DuckDB-exact answer.
  *
  * The eigenvector of the covariance matrix is scale-invariant, so
  * instead of covariance (whose 1/n and mean subtraction are float) we
  * iterate on the integer SCATTER matrix S = n·Σxxᵀ − (Σx)(Σx)ᵀ over
  * cent-quantized features: every entry is an exact decimal that both
  * engines cast to the identical double (one correctly-rounded
  * conversion). Power iteration then runs a FIXED `iters` steps from
  * v₀ = 1 with a pinned op order — each wᵢ a left-to-right 4-term dot,
  * the normalizer an order-free max(|w|), one division per component —
  * so the trajectory is bit-identical on any IEEE 754 engine (von Mises
  * & Pollaczek-Geiringer 1929; the convergence rate is |λ₂/λ₁|ᵏ, and
  * `iters` is part of the operator's contract, not a tolerance loop).
  *
  * Scale shape: the corpus-sized work is ONE aggregation computing all
  * k(k+1)/2 + k moments simultaneously (map-side combine — k features
  * cost one scan); the iteration closes over the k×k readout, a bounded
  * model artifact like [[Metrics.isotonicBins]]'s bin table. Width
  * audit (ANSI decimals): cent products ≤ 10¹⁴ ride DECIMAL(21,0) sums,
  * totals DECIMAL(19,0) (≥ 19 also forces DuckDB's int128 multiply — it
  * caps a product at the operands' storage class), n DECIMAL(9,0); t·t
  * down-casts to 27 digits before the subtraction so every intermediate
  * stays inside 38. A 100 TB corpus (n ~ 10¹²) re-runs the same audit
  * with (12,0)/(26,0)/(24,0); the shape is unchanged.
  *
  * Reference anchor: the reference's dimensionality path is sklearn
  * TruncatedSVD-adjacent dense math on the vectorized notes matrix
  * (Hap880_Final_Project.py:313-340); this is the distributed,
  * engine-exact counterpart for low-k numeric features.
  */
object Pca {

  /** Dominant eigenvector of the scatter matrix of `features` (money-like
    * columns, ≤ 2 decimal places), after `iters` pinned power steps.
    * Output: (component 1..k, loading, lambda) where `lambda` is the last
    * step's ∞-norm (the dominant-eigenvalue estimate of S) and `loading`
    * the ∞-normalized eigenvector coordinate.
    */
  def powerIteration(df: DataFrame, features: Seq[(String, Column)],
                     iters: Int): DataFrame = {
    val k = features.size
    require(k >= 2, "powerIteration needs at least two features")
    require(iters >= 1, "powerIteration needs at least one step")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(features.zipWithIndex.map { case ((_, c), i) =>
      (c.cast("decimal(12,2)") * 100).cast("long").as(s"c${i + 1}")
    }: _*)
    val pairs = for { i <- 1 to k; j <- i to k } yield (i, j)
    // width audit, valid on BOTH engines (DuckDB caps a multiply at its
    // operands' storage class — t must be ≥ DECIMAL(19) to force int128):
    // n·p at 9+21+1 = 31; t·t at 19+19 = 38, down-cast to 27 before the
    // subtraction so 31 − 27 lands at 32, inside every 38-digit budget
    val aggCols =
      pairs.map { case (i, j) =>
        sum((col(s"c$i") * col(s"c$j")).cast("decimal(21,0)"))
          .cast("decimal(21,0)").as(s"p${i}_$j")
      } ++
        (1 to k).map(i =>
          sum(col(s"c$i").cast("decimal(19,0)")).cast("decimal(19,0)").as(s"t$i")) ++
        Seq(count(lit(1)).cast("decimal(9,0)").as("n"))
    val agg = base.agg(aggCols.head, aggCols.tail: _*)
    val sRow = agg.select(pairs.map { case (i, j) =>
      (col("n") * col(s"p${i}_$j") -
        (col(s"t$i") * col(s"t$j")).cast("decimal(27,0)"))
        .cast("double").as(s"s${i}_$j")
    }: _*).collect()(0)
    val s = Array.tabulate(k, k) { (a, b) =>
      val (i, j) = (math.min(a, b) + 1, math.max(a, b) + 1)
      sRow.getAs[Double](s"s${i}_$j")
    }
    var v = Array.fill(k)(1.0)
    var lam = 0.0
    for (_ <- 1 to iters) {
      val w = Array.tabulate(k) { i =>
        var acc = s(i)(0) * v(0)
        var j = 1
        while (j < k) { acc += s(i)(j) * v(j); j += 1 }
        acc
      }
      val m = w.map(math.abs).max
      lam = m
      if (m != 0.0) v = w.map(_ / m)
    }
    (1 to k).map(i => (i.toLong, v(i - 1), lam))
      .toDF("component", "loading", "lambda")
  }

  /** DuckDB mirror of [[powerIteration]]: identical decimal widths,
    * identical double casts, and the iteration unrolled as `iters`
    * MATERIALIZED CTE levels (materialization is load-bearing — inlined,
    * each level's four references would copy the whole prefix 4×).
    * `centsSelect` must yield columns c1..ck of exact cents.
    */
  def powerIterationOracleSql(centsSelect: String, k: Int, iters: Int): String = {
    val pairs = for { i <- 1 to k; j <- i to k } yield (i, j)
    val aggSql =
      (pairs.map { case (i, j) =>
        s"CAST(SUM(CAST(c$i * c$j AS DECIMAL(21,0))) AS DECIMAL(21,0)) AS p${i}_$j"
      } ++
        (1 to k).map(i => s"CAST(SUM(c$i) AS DECIMAL(19,0)) AS t$i") ++
        Seq("CAST(count(*) AS DECIMAL(9,0)) AS n")).mkString(", ")
    def sName(i: Int, j: Int): String =
      if (i <= j) s"s${i}_$j" else s"s${j}_$i"
    val scatterSql = pairs.map { case (i, j) =>
      s"CAST(n * p${i}_$j - CAST(t$i * t$j AS DECIMAL(27,0)) AS DOUBLE) AS s${i}_$j"
    }.mkString(", ")
    val vCols = (1 to k).map(i => s"v$i").mkString(", ")
    val iterCtes = (1 to iters).map { step =>
      val prev = s"it${step - 1}"
      val wExprs = (1 to k).map { i =>
        (1 to k).map(j => s"sm.${sName(i, j)} * $prev.v$j").mkString(" + ") +
          s" AS w$i"
      }.mkString(", ")
      val mx = s"GREATEST(${(1 to k).map(i => s"abs(w$i)").mkString(", ")})"
      val norm = (1 to k)
        .map(i => s"CASE WHEN mx = 0 THEN v$i ELSE w$i / mx END AS v$i")
        .mkString(", ")
      s"""it$step AS MATERIALIZED (
         |  SELECT $norm, mx AS lam FROM (
         |    SELECT $wExprs, $mx AS mx, $vCols
         |    FROM $prev, sm) q
         |)""".stripMargin
    }.mkString(",\n")
    val unpivot = (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS component, v$i AS loading, lam AS lambda FROM it$iters")
      .mkString(" UNION ALL ")
    s"""WITH cents AS ($centsSelect),
       |mo AS (SELECT $aggSql FROM cents),
       |sm AS (SELECT $scatterSql FROM mo),
       |it0 AS (SELECT ${(1 to k).map(i => s"CAST(1 AS DOUBLE) AS v$i").mkString(", ")},
       |               CAST(0 AS DOUBLE) AS lam),
       |$iterCtes
       |$unpivot""".stripMargin
  }
}
