package graft.ops

import graft.SparkSpecBase

class ProfilerSpec extends SparkSpecBase {
  import spark.implicits._

  private val df = Seq(
    (Some(1.0), Some("a")),
    (Some(2.5), None),
    (None, Some("b")),
    (Some(2.5), Some("a"))
  ).toDF("num", "str")

  test("profile reports nulls, distincts, and typed min/max per column") {
    val out = Profiler.profile(df, Seq("num", "str"))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    val num = out("num")
    assert(num.getAs[Long]("n_nonnull") == 3L)
    assert(num.getAs[Long]("n_nulls") == 1L)
    assert(num.getAs[Long]("n_distinct") == 2L)
    assert(num.getAs[Double]("min_num") == 1.0)
    assert(num.getAs[Double]("max_num") == 2.5)
    assert(num.isNullAt(num.fieldIndex("min_str")))
    val str = out("str")
    assert(str.getAs[Long]("n_nonnull") == 3L)
    assert(str.getAs[Long]("n_distinct") == 2L)
    assert(str.getAs[String]("min_str") == "a")
    assert(str.getAs[String]("max_str") == "b")
    assert(str.isNullAt(str.fieldIndex("min_num")))
  }

  test("profile runs all columns in one aggregation (single Expand scan)") {
    val plan = Profiler.profile(df, Seq("num", "str")).queryExecution.optimizedPlan
    val scans = plan.collect { case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l }
    assert(scans.size == 1, s"expected one scan of the input, got ${scans.size}")
  }

  test("profile rejects unsupported column types") {
    val withTs = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "ts")
    intercept[IllegalArgumentException] {
      Profiler.profile(withTs, Seq("ts"))
    }
    intercept[IllegalArgumentException] {
      Profiler.profile(withTs, Seq("nope"))
    }
  }
}
