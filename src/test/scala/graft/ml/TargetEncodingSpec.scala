package graft.ml

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TargetEncodingSpec extends SparkSpecBase {
  import spark.implicits._

  // 10 rows: cat a → 4 rows 3 pos; cat b → 5 rows 1 pos; cat c → 1 row 0 pos
  private def df = Seq(
    ("a", 1), ("a", 1), ("a", 1), ("a", 0),
    ("b", 1), ("b", 0), ("b", 0), ("b", 0), ("b", 0),
    ("c", 0)
  ).toDF("cat", "y")

  test("encode interpolates between category rate and prior by alpha") {
    val enc = TargetEncoding.encode(df, "cat", col("y") === 1, alpha = 2.0)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("encoding")).toMap
    val prior = 4.0 / 10.0
    assert(math.abs(enc("a") - (3 + 2 * prior) / (4 + 2)) < 1e-12)
    assert(math.abs(enc("b") - (1 + 2 * prior) / (5 + 2)) < 1e-12)
    // singleton category: dominated by the prior, not its own 0/1 label
    assert(math.abs(enc("c") - (0 + 2 * prior) / (1 + 2)) < 1e-12)
  }

  test("alpha → ∞ collapses every encoding toward the prior") {
    val enc = TargetEncoding.encode(df, "cat", col("y") === 1, alpha = 1e9)
      .collect().map(_.getAs[Double]("encoding"))
    enc.foreach(e => assert(math.abs(e - 0.4) < 1e-6))
  }

  test("leave-one-out excludes the row's own label") {
    val keyed = df.withColumn("id", monotonically_increasing_id())
    val loo = TargetEncoding.looEncode(keyed, "cat", col("y") === 1, alpha = 2.0)
      .select("cat", "y", "loo_encoding")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getAs[Double]("loo_encoding")).toMap
    val prior = 0.4
    // a positive row of cat a sees (3-1) positives over (4-1) peers
    assert(math.abs(loo(("a", 1)) - (3 - 1 + 2 * prior) / (4 - 1 + 2)) < 1e-12)
    assert(math.abs(loo(("a", 0)) - (3 - 0 + 2 * prior) / (4 - 1 + 2)) < 1e-12)
    // the singleton category's only row sees pure prior smoothing
    assert(math.abs(loo(("c", 0)) - (2 * prior) / 2) < 1e-12)
  }

  test("crossfit cells use exactly the other folds' statistics") {
    val keyed = (1 to 200).map(i => (i.toLong, if (i % 3 == 0) "a" else "b", i % 2))
      .toDF("id", "cat", "y")
    val cells = TargetEncoding.crossfitEncode(keyed, "id", "cat", col("y") === 1,
      alpha = 5.0, folds = 3).collect()
    // recompute every complement from the collected cell table itself
    val raw = cells.map(r => (r.getAs[String]("cat"), r.getAs[Long]("fold")) ->
      (r.getAs[Long]("cnt"), r.getAs[Long]("pos"))).toMap
    cells.foreach { r =>
      val (cat, fold) = (r.getAs[String]("cat"), r.getAs[Long]("fold"))
      val tc = raw.collect { case ((c, _), (n, _)) if c == cat => n }.sum
      val tp = raw.collect { case ((c, _), (_, p)) if c == cat => p }.sum
      val fc = raw.collect { case ((_, f), (n, _)) if f == fold => n }.sum
      val fp = raw.collect { case ((_, f), (_, p)) if f == fold => p }.sum
      val gc = raw.values.map(_._1).sum
      val gp = raw.values.map(_._2).sum
      val (cnt, pos) = raw((cat, fold))
      val prior = (gp - fp).toDouble / (gc - fc)
      val expected = ((tp - pos) + 5.0 * prior) / ((tc - cnt) + 5.0)
      assert(math.abs(r.getAs[Double]("encoding") - expected) < 1e-12,
        s"cell ($cat,$fold)")
    }
    // every (cat, fold) cell exists on this dense fixture
    assert(cells.length == 2 * 3)
  }

  test("woeBinned: per-bin counts and the WOE/IV formula on median bins") {
    // values 1..10, positives are 8/9/10; median cut at 5 → bin0 = 1..5
    // (0 pos / 5 neg), bin1 = 6..10 (3 pos / 2 neg)
    val df = (1 to 10).map(i => (i.toDouble, if (i > 7) 1 else 0)).toDF("v", "y")
    val out = TargetEncoding.woeBinned(df, "v", col("y") === 1, Seq(0.5))
      .collect().map(r => r.getAs[Int]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Long]("pos"), r.getAs[Long]("neg"),
          r.getAs[Double]("woe"), r.getAs[Double]("iv_term"))).toMap
    val (n0, p0, g0, w0, _) = out(0)
    val (n1, p1, g1, w1, iv1) = out(1)
    assert((n0, p0, g0) == (5L, 0L, 5L))
    assert((n1, p1, g1) == (5L, 3L, 2L))
    def woe(pos: Double, neg: Double): Double =
      math.log(((pos + 0.5) * (7 + 0.5)) / ((neg + 0.5) * (3 + 0.5)))
    assert(math.abs(w0 - woe(0, 5)) < 1e-6)
    assert(math.abs(w1 - woe(3, 2)) < 1e-6)
    assert(w0 < 0 && w1 > 0) // bin1 is positive-enriched, bin0 depleted
    val ivExpected = ((3 + 0.5) / (3 + 0.5) - (2 + 0.5) / (7 + 0.5)) * w1
    assert(math.abs(iv1 - ivExpected) < 1e-5)
  }
}
