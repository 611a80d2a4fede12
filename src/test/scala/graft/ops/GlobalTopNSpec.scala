package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class GlobalTopNSpec extends SparkSpecBase {
  import spark.implicits._

  // values deliberately shuffled and duplicated so the total order needs
  // the id tiebreak
  private lazy val df = Seq(
    (5L, 3.0), (1L, 1.0), (9L, 2.0), (2L, 1.0), (7L, 0.5),
    (3L, 4.0), (8L, 0.5), (4L, 2.0), (6L, 3.0), (10L, 5.0)
  ).toDF("id", "v")

  private def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("id").collect().map(_.getLong(0)).toSet

  test("topN matches orderBy/limit semantics exactly") {
    val expected = df.orderBy(col("v"), col("id")).limit(4)
    assert(ids(GlobalTopN.topN(df, 4L, col("v"), col("id"))) == ids(expected))
    assert(ids(GlobalTopN.topN(df, 4L, col("v"), col("id"))) == Set(7L, 8L, 1L, 2L))
  }

  test("topN boundary cases: n=0, n>=rows, n=1") {
    assert(GlobalTopN.topN(df, 0L, col("v"), col("id")).count() == 0)
    assert(GlobalTopN.topN(df, 100L, col("v"), col("id")).count() == 10)
    assert(ids(GlobalTopN.topN(df, 1L, col("v"), col("id"))) == Set(7L))
  }

  test("topN plans no TakeOrderedAndProject (nothing funnels through the driver)") {
    val plan = GlobalTopN.topN(df, 4L, col("v"), col("id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrderedAndProject"), plan)
  }

  test("topN result is deterministic across repeated runs") {
    val a = ids(GlobalTopN.topN(df, 6L, col("v"), col("id")))
    val b = ids(GlobalTopN.topN(df, 6L, col("v"), col("id")))
    assert(a == b)
  }
}
