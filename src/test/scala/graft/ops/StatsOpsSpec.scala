package graft.ops

import graft.SparkSpecBase

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
}
