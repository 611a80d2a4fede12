package graft.ml

import graft.SparkSpecBase

class MetricsSpec extends SparkSpecBase {
  import spark.implicits._

  // scores with a tie straddling classes: AUC must use average ranks
  private val scored = Seq(
    (0.9, 1.0), (0.8, 1.0), (0.7, 0.0), (0.6, 1.0),
    (0.6, 0.0), (0.4, 0.0), (0.3, 0.0), (0.2, 1.0)
  ).toDF("score", "y")

  test("aucRoc matches the hand-computed Mann-Whitney value with ties") {
    // ranks asc: 0.2->1, 0.3->2, 0.4->3, 0.6->{4,5}->4.5 each, 0.7->6, 0.8->7, 0.9->8
    // pos ranks: 8 + 7 + 4.5 + 1 = 20.5; AUC = (20.5 - 4*5/2) / (4*4) = 10.5/16
    val auc = Metrics.aucRoc(scored, "score", "y")
    assert(math.abs(auc - 10.5 / 16.0) < 1e-12)
  }

  test("perfect and inverted separations give AUC 1 and 0") {
    val perfect = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0)).toDF("score", "y")
    assert(Metrics.aucRoc(perfect, "score", "y") == 1.0)
    val inverted = Seq((0.1, 1.0), (0.2, 1.0), (0.8, 0.0), (0.9, 0.0)).toDF("score", "y")
    assert(Metrics.aucRoc(inverted, "score", "y") == 0.0)
  }

  test("single-class input gives AUC 0.0, never NaN") {
    val onlyPos = Seq((0.9, 1.0), (0.4, 1.0)).toDF("score", "y")
    assert(Metrics.aucRoc(onlyPos, "score", "y") == 0.0)
    val onlyNeg = Seq((0.9, 0.0), (0.4, 0.0)).toDF("score", "y")
    assert(Metrics.aucRoc(onlyNeg, "score", "y") == 0.0)
  }

  test("thresholdMetrics counts and ratios at 0.5") {
    val m = Metrics.thresholdMetrics(scored, "score", "y", 0.5).collect()(0)
    assert(m.getAs[Long]("tp") == 3 && m.getAs[Long]("fp") == 2)
    assert(m.getAs[Long]("tn") == 2 && m.getAs[Long]("fn") == 1)
    assert(m.getAs[Double]("accuracy") == 5.0 / 8)
    assert(m.getAs[Double]("recall") == 3.0 / 4)
  }

  test("thresholdMetrics is 0-safe when a class is empty") {
    val allNeg = Seq((0.1, 0.0), (0.2, 0.0)).toDF("score", "y")
    val m = Metrics.thresholdMetrics(allNeg, "score", "y", 0.5).collect()(0)
    assert(m.getAs[Double]("recall") == 0.0)
    assert(m.getAs[Double]("precision_") == 0.0)
  }

  test("ConfusionAggregator one-pass counters match the agg form") {
    val ds = scored.as[(Double, Double)]
    val c = ds.select(new Metrics.ConfusionAggregator(0.5).toColumn).collect()(0)
    assert(c == Metrics.Confusion(3, 2, 2, 1))
    assert(c.f1 == 2 * (3.0 / 5) * (3.0 / 4) / ((3.0 / 5) + (3.0 / 4)))
  }

  test("rocPoints is monotone and ends at (1,1)") {
    val pts = Metrics.rocPoints(scored, "score", "y")
      .orderBy("fpr", "tpr").collect()
    val fprs = pts.map(_.getAs[Double]("fpr")).toSeq
    val tprs = pts.map(_.getAs[Double]("tpr")).toSeq
    assert(fprs == fprs.sorted && tprs == tprs.sorted)
    assert(fprs.last == 1.0 && tprs.last == 1.0)
  }

  test("calibrationBins: sizes, exact means, positive rates, edge clamp") {
    // bin = floor(score*4) clamped to [0,3]; 1.0 and -0.1 land in edges
    val df = Seq(
      (0.10, 1.0), (0.20, 0.0),            // bin 0
      (0.30, 1.0), (0.40, 1.0),            // bin 1
      (0.60, 0.0),                         // bin 2
      (1.00, 1.0), (-0.10, 0.0)            // clamps: bin 3, bin 0
    ).toDF("score", "y")
    val rows = Metrics.calibrationBins(df, "score", "y", 4)
      .orderBy("bin").collect()
    assert(rows.map(_.getAs[Int]("bin")).toSeq == Seq(0, 1, 2, 3))
    assert(rows.map(_.getAs[Long]("n")).toSeq == Seq(3L, 2L, 1L, 1L))
    val m = rows.map(r => r.getAs[Int]("bin") -> r.getAs[Double]("mean_score")).toMap
    assert(math.abs(m(0) - 0.066667) < 1e-9) // (0.1+0.2-0.1)/3 rounded to 6dp
    assert(m(1) == 0.35 && m(2) == 0.6 && m(3) == 1.0)
    val fp = rows.map(r => r.getAs[Int]("bin") -> r.getAs[Double]("frac_pos")).toMap
    assert(math.abs(fp(0) - 0.333333) < 1e-9 && fp(1) == 1.0 && fp(2) == 0.0 && fp(3) == 1.0)
  }

  test("liftTable: bucket splits, lift vs base rate, cumulative gain") {
    // 10 rows, k=2 -> buckets of 5 by score desc; top half has 4/5
    // positives, bottom half 1/5; base rate 5/10
    val df = (1 to 10).map { i =>
      val score = 11.0 - i                 // row 1 highest
      val y = if (i <= 4 || i == 6) 1 else 0
      (score, i.toLong, y)
    }.toDF("score", "id", "y")
    val rows = Metrics.liftTable(df, "score", "id", "y", 2)
      .orderBy("bucket").collect()
    assert(rows.map(_.getAs[Int]("bucket")).toSeq == Seq(1, 2))
    assert(rows.map(_.getAs[Long]("n_rows")).toSeq == Seq(5L, 5L))
    assert(rows.map(_.getAs[Long]("n_pos")).toSeq == Seq(4L, 1L))
    assert(rows.map(_.getAs[Double]("lift")).toSeq == Seq(1.6, 0.4))
    assert(rows.map(_.getAs[Double]("cum_gain")).toSeq == Seq(0.8, 1.0))
  }

  test("liftTable: non-divisible n spreads remainder like (rn-1)*k div n") {
    // 7 rows, k=3: bucket sizes follow floor arithmetic -> 3,2,2
    val df = (1 to 7).map(i => (10.0 - i, i.toLong, i % 2)).toDF("score", "id", "y")
    val rows = Metrics.liftTable(df, "score", "id", "y", 3)
      .orderBy("bucket").collect()
    assert(rows.map(_.getAs[Long]("n_rows")).toSeq == Seq(3L, 2L, 2L))
    assert(rows.map(_.getAs[Double]("cum_gain")).last == 1.0)
  }

  test("liftTable: empty input yields an empty table, not a crash") {
    val df = Seq.empty[(Double, Long, Int)].toDF("score", "id", "y")
    assert(Metrics.liftTable(df, "score", "id", "y", 5).collect().isEmpty)
  }

  test("aucRocBy equals the global AUC computed per segment; one-class is null") {
    val seg = Seq(
      // segment "a": the tie-straddling fixture (AUC 10.5/16)
      ("a", 0.9, 1.0), ("a", 0.8, 1.0), ("a", 0.7, 0.0), ("a", 0.6, 1.0),
      ("a", 0.6, 0.0), ("a", 0.4, 0.0), ("a", 0.3, 0.0), ("a", 0.2, 1.0),
      // segment "b": perfect separation (AUC 1.0)
      ("b", 0.9, 1.0), ("b", 0.8, 1.0), ("b", 0.2, 0.0),
      // segment "c": positives only -> null
      ("c", 0.5, 1.0), ("c", 0.6, 1.0)
    ).toDF("segment", "score", "y")
    val out = Metrics.aucRocBy(seg, "score", "y", "segment")
      .collect().map(r => r.getAs[String]("segment") ->
        Option(r.getAs[java.lang.Double]("auc_roc"))).toMap
    assert(math.abs(out("a").get - 10.5 / 16.0) < 1e-12)
    assert(out("b").get == 1.0)
    assert(out("c").isEmpty)
  }

  test("isotonicBins equals reference PAVA and preserves pool structure") {
    // engineered bins: raw rates 0.8, 0.2, 0.5 (violator in the middle)
    // with unequal weights — PAVA pools bins 0-1 (weighted avg), bin 2
    // stays if still >= the pool, else pools further
    val rows =
      (1 to 10).map(i => (0.05, if (i <= 8) 1 else 0)) ++   // bin 0: 8/10
      (1 to 20).map(i => (0.15, if (i <= 4) 1 else 0)) ++   // bin 1: 4/20
      (1 to 10).map(i => (0.25, if (i <= 5) 1 else 0))      // bin 2: 5/10
    val df = rows.toDF("score", "y")
    val got = graft.ml.Metrics.isotonicBins(df, "score", "y", 10)
      .collect().map(r => r.getAs[Int]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Double]("raw_rate"), r.getAs[Double]("fitted"))).toMap

    // reference PAVA (weighted pool-adjacent-violators, O(B) stack)
    def pava(w: Array[Long], y: Array[Double]): Array[Double] = {
      case class Blk(var ws: Double, var sum: Double, var n: Int)
      val st = scala.collection.mutable.ArrayBuffer[Blk]()
      for (i <- w.indices) {
        st += Blk(w(i).toDouble, y(i) * w(i), 1)
        while (st.length > 1 &&
          st(st.length - 2).sum / st(st.length - 2).ws >= st.last.sum / st.last.ws) {
          val b = st.remove(st.length - 1)
          st.last.ws += b.ws; st.last.sum += b.sum; st.last.n += b.n
        }
      }
      st.flatMap(b => Seq.fill(b.n)(b.sum / b.ws)).toArray
    }
    val bins = got.keys.toSeq.sorted
    val ref = pava(
      bins.map(b => got(b)._1).toArray,
      bins.map(b => got(b)._2).toArray)
    bins.zipWithIndex.foreach { case (b, i) =>
      assert(math.abs(got(b)._3 - ref(i)) < 1e-12, s"bin $b: ${got(b)._3} vs ${ref(i)}")
    }
    // monotone non-decreasing
    bins.sliding(2).foreach {
      case Seq(a, b) => assert(got(a)._3 <= got(b)._3)
      case _         =>
    }
    // pooled bins 0-1: (8+4)/(10+20) = 0.4; bin 2 raw 0.5 stays
    assert(math.abs(got(0)._3 - 0.4) < 1e-12)
    assert(math.abs(got(1)._3 - 0.4) < 1e-12)
    assert(math.abs(got(2)._3 - 0.5) < 1e-12)
  }

  test("conformalSplit: exact order statistic and coverage on an engineered split") {
    import org.apache.spark.sql.functions._
    // cal = 1..99 (mean exactly 50, scores |y-50| = 0,1,1,...,49,49);
    // k = ceil(0.9 * 100) = 90 -> the 90th smallest score is 45
    val df = ((1 to 99).map(v => (v.toDouble, true)) ++
      Seq((60.0, false), (96.0, false), (200.0, false))).toDF("v", "is_cal")
    val row = graft.ml.Metrics.conformalSplit(df, "v", col("is_cal"), alpha = 0.1)
      .collect().head
    assert(row.getAs[Long]("n_cal") === 99L)
    assert(row.getAs[Double]("q_hat") === 45.0)
    assert(row.getAs[Long]("n_test") === 3L)
    // covered: |60-50|=10 <= 45, |96-50|=46 > 45, |200-50|=150 > 45
    assert(row.getAs[Long]("n_covered") === 1L)
    assert(row.getAs[Long]("coverage_micro") === 333333L)
  }

  test("conformalSplit: hash-split coverage is near 1 - alpha on exchangeable data") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
    val isCal = pmod(graft.text.TextOps.md5Hash60(
      concat(col("o_orderkey").cast("string"), lit(":conftest"))), lit(1000L)) < 200
    val row = graft.ml.Metrics.conformalSplit(df, "o_totalprice", isCal, alpha = 0.1)
      .collect().head
    val cov = row.getAs[Long]("coverage_micro") / 1e6
    assert(cov >= 0.85 && cov <= 1.0, s"coverage $cov implausible for alpha=0.1")
  }

  test("conformalSplit: empty calibration split is a contract error, not an NPE") {
    import org.apache.spark.sql.functions._
    val df = Seq((1.0, false), (2.0, false)).toDF("v", "is_cal")
    val e = intercept[IllegalArgumentException] {
      graft.ml.Metrics.conformalSplit(df, "v", col("is_cal"), alpha = 0.1)
    }
    assert(e.getMessage.contains("calibration split is empty"))
  }

  test("conformalSplit: rank k > n_cal (unattainable coverage) is a contract error") {
    import org.apache.spark.sql.functions._
    // n_cal = 3, alpha = 0.01 -> k = ceil(0.99 * 4) = 4 > 3
    val df = Seq((1.0, true), (2.0, true), (3.0, true), (9.0, false)).toDF("v", "is_cal")
    val e = intercept[IllegalArgumentException] {
      graft.ml.Metrics.conformalSplit(df, "v", col("is_cal"), alpha = 0.01)
    }
    assert(e.getMessage.contains("unattainable"))
  }

  test("brierDecomp: Murphy terms exact on a hand-computed two-bin table") {
    // dyadic scores so every intermediate is an exact double:
    // bin 0: scores 0.25 (micros 250000), 2 pos of 4 -> pbar=0.25, ob=0.5
    // bin 1: scores 0.75, 2 pos of 4 -> pbar=0.75, ob=0.5; obar=0.5
    val rows = Seq.fill(2)((250000L, 0)) ++ Seq.fill(2)((250000L, 1)) ++
      Seq.fill(2)((750000L, 1)) ++ Seq.fill(2)((750000L, 0))
    val df = rows.toDF("sm", "y")
    val r = graft.ml.Metrics.brierDecomp(df, "sm", "y", 2).collect().head
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("n_bins") == 2L)
    assert(r.getAs[Double]("base_rate") == 0.5)
    // REL = (4*(0.25)^2 + 4*(0.25)^2)/8 = 0.0625; RES = 0 (both bins at base)
    assert(r.getAs[Double]("reliability") == 0.0625)
    assert(r.getAs[Double]("resolution") == 0.0)
    assert(r.getAs[Double]("uncertainty") == 0.25)
    assert(r.getAs[Double]("brier_binned") == 0.3125)
  }

  test("aucPrReordered reproduces sklearn's curve boundaries exactly " +
    "(recall-tail truncation + terminal point) on a hand-computed example") {
    // margins/labels: (3,1) (2,0) (1,1) (0.5,0) (0.2,0); P=2.
    // sklearn precision_recall_curve truncates at the FIRST full-recall
    // threshold (t=1: prec 2/3, rec 1) — the t=0.5/0.2 points (prec 1/2,
    // 2/5 at rec 1) are never emitted — and appends the terminal (1, 0).
    // Points: (prec, rec) = (2/3,1), (1/2,1/2), (1,1/2), (1,0).
    // auc(x=p, y=r, reorder=True) over precision ascending:
    //   (1/2→2/3): (1/6)·(1/2+1)/2 = 0.125
    //   (2/3→1):   (1/3)·(1+0)/2   = 1/6      (tie order (1,0) before (1,1/2))
    //   (1→1):     0
    // = 0.2916666…; the untruncated tail would instead integrate from
    // precision 2/5 and read ~0.4417 — the test distinguishes.
    val df = Seq((3.0, 1.0), (2.0, 0.0), (1.0, 1.0), (0.5, 0.0), (0.2, 0.0))
      .toDF("margin", "y")
    val auc = graft.ml.Metrics.aucPrReordered(df, "margin", "y")
    assert(math.abs(auc - (0.125 + 1.0 / 6.0)) < 1e-9,
      s"auc_pr $auc != hand-computed 0.291666…")
  }

  test("aucPrReordered with ZERO positives returns NaN, not a silent 0/NaN " +
    "integral (Spark orders NaN above every double, so unguarded 0/0 " +
    "recalls would all route into the full-recall branch)") {
    val df = Seq((0.9, 0.0), (0.4, 0.0), (0.1, 0.0)).toDF("margin", "y")
    val auc = graft.ml.Metrics.aucPrReordered(df, "margin", "y")
    assert(auc.isNaN, s"expected NaN on a zero-positive frame, got $auc")
  }
}
