package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class GroupZScoreSpec extends SparkSpecBase {
  import spark.implicits._

  test("z-scores have per-group mean ~0 and sample stddev ~1") {
    val df = (1 to 300).map(i => (if (i % 2 == 0) "a" else "b", (i % 17 * 3).toDouble))
      .toDF("g", "v")
    val z = StatsOps.groupZScore(df, Seq("g"), "v")
    val stats = z.groupBy("g")
      .agg(avg("z").as("m"), stddev_samp("z").as("sd")).collect()
    stats.foreach { r =>
      assert(math.abs(r.getAs[Double]("m")) < 1e-9)
      assert(math.abs(r.getAs[Double]("sd") - 1.0) < 1e-9)
    }
  }

  test("hand-computed group: values 1,2,3 → z = -1, 0, 1") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0)).toDF("g", "v")
    val z = StatsOps.groupZScore(df, Seq("g"), "v")
      .orderBy("v").select("z").as[Double].collect()
    // mean 2, sample std 1
    assert(z.zip(Seq(-1.0, 0.0, 1.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("scaling constants are partitioning-invariant (exact moments)") {
    // compare per-row z values bit-for-bit (a double SUM over them would
    // itself be order-dependent and mask the property under test)
    val base = (1 to 1000).map(i => ("g", (i * 7 % 113).toDouble))
    val z1 = StatsOps.groupZScore(base.toDF("g", "v").coalesce(1), Seq("g"), "v")
      .select("v", "z").as[(Double, Double)].collect().sorted.toSeq
    val z13 = StatsOps.groupZScore(base.toDF("g", "v").repartition(13), Seq("g"), "v")
      .select("v", "z").as[(Double, Double)].collect().sorted.toSeq
    assert(z1 == z13)
  }

  test("singleton group yields NaN z (documented), others unaffected") {
    val df = Seq(("solo", 5.0), ("pair", 1.0), ("pair", 2.0)).toDF("g", "v")
    val out = StatsOps.groupZScore(df, Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getAs[Double]("z")))
    assert(out.filter(_._1 == "solo").forall(_._2.isNaN))
    assert(out.filter(_._1 == "pair").forall(!_._2.isNaN))
  }
}
