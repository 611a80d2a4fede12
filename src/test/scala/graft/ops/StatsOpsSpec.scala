package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions.col

class StatsOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("corrPairs recovers perfect positive and negative correlation") {
    val df = (1 to 100).map(i => (i.toDouble, 2.0 * i + 5, -3.0 * i))
      .toDF("a", "b", "c")
    val out = StatsOps.corrPairs(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("corr")).toMap
    assert(out(("a", "b")) == 1.0)
    assert(out(("a", "c")) == -1.0)
    assert(out(("b", "c")) == -1.0)
  }

  test("corrPairs matches Spark's builtin corr to double precision") {
    val df = (1 to 500).map { i =>
      val x = (i * 37 % 101).toDouble
      val y = ((i * 17 % 89) + (i % 7)).toDouble
      (x, y)
    }.toDF("x", "y")
    val exact = StatsOps.corrPairs(df, Seq("x", "y"))
      .collect().head.getAs[Double]("corr")
    val builtin = df.stat.corr("x", "y")
    assert(math.abs(exact - builtin) < 1e-9)
  }

  test("corrPairs is invariant to partitioning (exact accumulation)") {
    val base = (1 to 1000).map(i => ((i * 13 % 97).toDouble, (i * 29 % 83).toDouble))
    val one = StatsOps.corrPairs(base.toDF("x", "y").coalesce(1), Seq("x", "y"))
      .collect().head.getAs[Double]("corr")
    val many = StatsOps.corrPairs(base.toDF("x", "y").repartition(13), Seq("x", "y"))
      .collect().head.getAs[Double]("corr")
    // bit-identical, not just close: the whole point of decimal accumulation
    assert(one == many)
  }

  test("gini: 0 for perfect equality, (n-1)/n for total concentration") {
    val equal = (1L to 10L).map(i => (i, 100L)).toDF("id", "v")
    val g0 = StatsOps.gini(equal, col("v"), col("id")).collect().head
    assert(g0.getAs[Long]("n_units") == 10L)
    assert(g0.getAs[Double]("gini") == 0.0)
    // one unit holds everything: G = (n-1)/n = 0.9
    val conc = ((1L to 9L).map(i => (i, 0L)) :+ (10L, 1000L)).toDF("id", "v")
    val g1 = StatsOps.gini(conc, col("v"), col("id")).collect().head
    assert(g1.getAs[Double]("gini") == 0.9)
    // all-zero measure: guarded to 0, not a divide-by-zero
    val zero = (1L to 5L).map(i => (i, 0L)).toDF("id", "v")
    assert(StatsOps.gini(zero, col("v"), col("id"))
      .collect().head.getAs[Double]("gini") == 0.0)
  }

  test("gini is invariant to input partitioning") {
    val base = (1L to 400L).map(i => (i, (i * 37L) % 101L))
    val one = StatsOps.gini(base.toDF("id", "v").coalesce(1), col("v"), col("id"))
      .collect().head.getAs[Double]("gini")
    val many = StatsOps.gini(base.toDF("id", "v").repartition(13), col("v"), col("id"))
      .collect().head.getAs[Double]("gini")
    assert(one == many)
  }

  test("spearman: ±1 for monotone data regardless of nonlinearity") {
    val df = (1 to 200).map(i => (i.toDouble, math.exp(i / 50.0))).toDF("x", "y")
    val up = StatsOps.spearman(df, "x", "y").collect().head
    assert(up.getAs[Long]("n") == 200L)
    assert(up.getAs[Double]("rho") == 1.0)
    val down = StatsOps.spearman(
      (1 to 200).map(i => (i.toDouble, -math.log(i.toDouble))).toDF("x", "y"), "x", "y")
      .collect().head.getAs[Double]("rho")
    assert(down == -1.0)
  }

  test("spearman's rank-table offsets REUSE their ranged exchanges (the lazy " +
    "CDF's correctness contract — see RunningTotal's scaladoc)") {
    val df = (1 to 500).map(i => (i.toDouble % 37, i.toDouble % 53)).toDF("x", "y")
    val out = StatsOps.spearman(df, "x", "y")
    out.collect()
    val full = out.queryExecution.executedPlan.toString
    val p = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
    assert(p.contains("ReusedExchange"),
      s"an offsets subtree re-evaluated its range exchange:\n$p")
    // two rank tables → two real range exchanges; their offsets subtrees
    // must appear as reuse references, not additional materializations
    val real = p.linesIterator.count(l =>
      l.contains("Exchange rangepartitioning") && !l.contains("ReusedExchange"))
    assert(real == 2, s"expected 2 materialized range exchanges, got $real:\n$p")
  }

  test("spearman handles ties via average ranks (scipy-checked value)") {
    // x = [1,2,2,3], y = [10,20,20,40]: identical tie structure → rho = 1
    val tied = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0)).toDF("x", "y")
    assert(StatsOps.spearman(tied, "x", "y").collect().head.getAs[Double]("rho") == 1.0)
    // x = [1,2,3,4], y = [1,3,3,2]: ranks y = [1, 3.5, 3.5, 2] →
    // rho = 1.5/√(5·4.5) = 0.316227766 (= scipy.stats.spearmanr)
    val mixed = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 3.0), (4.0, 2.0)).toDF("x", "y")
    val rho = StatsOps.spearman(mixed, "x", "y").collect().head.getAs[Double]("rho")
    assert(math.abs(rho - 0.316227766) < 1e-8, s"rho=$rho")
  }

  test("spearman is invariant to partitioning and drops null pairs") {
    val base = (1 to 500).map(i => ((i * 37 % 101).toDouble, (i * 17 % 89).toDouble))
    val one = StatsOps.spearman(base.toDF("x", "y").coalesce(1), "x", "y")
      .collect().head.getAs[Double]("rho")
    val many = StatsOps.spearman(base.toDF("x", "y").repartition(13), "x", "y")
      .collect().head.getAs[Double]("rho")
    assert(one == many)
    val withNulls = (base.map { case (x, y) => (Some(x), Some(y)) } :+
      ((None: Option[Double]), Some(1.0)) :+ (Some(1.0), (None: Option[Double])))
      .toDF("x", "y")
    assert(StatsOps.spearman(withNulls, "x", "y").collect().head.getAs[Long]("n") == 500L)
  }

  test("benford: digit extraction, zero-filled digits, integer shares, constants") {
    val df = Seq("123.45", "19.99", "2000.00", "150.00", "900.50", "85.00")
      .toDF("amt").select(col("amt").cast("decimal(12,2)").as("amt"))
    val rows = StatsOps.benford(df, col("amt")).collect()
      .map(r => r.getAs[Long]("digit") ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("share_micros"),
          r.getAs[Long]("benford_micros")))).toMap
    assert(rows.keySet == (1L to 9L).toSet)
    // digits: 1,1,2,1,9,8 -> counts 1->3 2->1 8->1 9->1, rest zero
    assert(rows(1L)._1 == 3L && rows(2L)._1 == 1L &&
      rows(8L)._1 == 1L && rows(9L)._1 == 1L && rows(3L)._1 == 0L)
    assert(rows(1L)._2 == 500000L) // round(3e6/6)
    assert(rows(3L)._2 == 0L)
    // the JVM-precomputed Benford constants: log10(2) and log10(10/9)
    assert(rows(1L)._3 == 301030L && rows(9L)._3 == 45757L)
    // shares of a full partition sum to ~1e6 (rounding jitter only)
    val tot = rows.values.map(_._2).sum
    assert(math.abs(tot - 1000000L) <= 9L)
  }

  test("benford: out-of-domain amounts (< 1, negative) are excluded, not crashed on") {
    // 0.50 would extract digit '0' (dropping out of the digit join) and
    // -3.00 would ANSI-abort the '-'->BIGINT cast; the domain filter
    // excludes both identically on both engines
    val df = Seq("123.45", "0.50", "-3.00", "0.99", "85.00")
      .toDF("amt").select(col("amt").cast("decimal(12,2)").as("amt"))
    val rows = StatsOps.benford(df, col("amt")).collect()
      .map(r => r.getAs[Long]("digit") -> r.getAs[Long]("cnt")).toMap
    assert(rows.keySet == (1L to 9L).toSet)
    assert(rows(1L) == 1L && rows(8L) == 1L)
    assert(rows.values.sum == 2L) // only the two >= 1 amounts counted
  }
}
