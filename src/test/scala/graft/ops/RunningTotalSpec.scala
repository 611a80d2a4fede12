package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RunningTotalSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val df = Seq(
    (5L, 50L), (1L, 10L), (9L, 90L), (2L, 20L), (7L, 70L),
    (3L, 30L), (8L, 80L), (4L, 40L), (6L, 60L), (10L, 100L)
  ).toDF("id", "v")

  test("prefix sums equal the single-partition window form") {
    val (got, grandDf) =
      RunningTotal.withRunningSum(df, col("v"), "cum", col("id"))
    val g = got.select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("cum",
        sum("v").over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g == want)
    assert(grandDf.collect().head.getLong(0) == (10L to 100L by 10L).sum)
    assert(got.count() == 10L) // fully lazy: repeat actions stay correct
  }

  test("nulls count as zero; empty input gives grand total 0") {
    val withNull = df.withColumn("v", when(col("id") === 1L, lit(null)).otherwise(col("v")))
    val (got, grandDf) =
      RunningTotal.withRunningSum(withNull, col("v"), "cum", col("id"))
    val byId = got.select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == 0L && byId(2L) == 20L)
    assert(grandDf.collect().head.getLong(0) == (10L to 100L by 10L).sum - 10L)
    val (_, g0) = RunningTotal.withRunningSum(
      df.filter(col("id") < 0), col("v"), "cum", col("id"))
    assert(g0.collect().head.getLong(0) == 0L)
  }

  test("the only single-partition exchange feeds the <=P-row offsets table " +
    "(the data path is range-partitioned + per-partition windows)") {
    val (got, _) =
      RunningTotal.withRunningSum(df, col("v"), "cum", col("id"))
    val p = got.queryExecution.executedPlan.toString
    // exactly one SinglePartition, and it sits under the BroadcastExchange
    // of the offsets prefix sum (input = the _pid-keyed aggregate, <=
    // shuffle-partitions rows) - a parallelism-bounded funnel, never data
    assert(p.split("SinglePartition").length - 1 == 1, p)
    val broadcastIdx = p.indexOf("BroadcastExchange")
    assert(broadcastIdx >= 0 && p.indexOf("SinglePartition") > broadcastIdx, p)
  }

  test("the offsets subtree REUSES the ranged exchange when the consumer is " +
    "slim (the lazy design's correctness contract: range boundaries are " +
    "sampled per RDD id, so an independent re-evaluation could partition " +
    "differently than the data path)") {
    val (got, _) =
      RunningTotal.withRunningSum(df, col("v"), "cum", col("id"))
    // SLIM consumption — every surviving column feeds both subtrees, so
    // the two exchange children canonicalize identically and AQE reuses
    // the materialized stage. A consumer that keeps a column NEITHER the
    // ordering nor the value touches would prune the two sides
    // differently and defeat reuse (the scaladoc's contract note); every
    // in-repo caller passes slim (ord, value) frames, and each oracled
    // consumer is additionally hash-checked end to end.
    val slim = got.select("id", "cum")
    slim.collect()
    val full = slim.queryExecution.executedPlan.toString
    val p = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
    assert(p.contains("ReusedExchange"),
      s"offsets subtree re-evaluated the range exchange instead of reusing it:\n$p")
    // and only ONE materialized range exchange — the second occurrence is
    // the reuse reference's description, not a real node
    assert(p.split("Exchange rangepartitioning").length - 1 <= 2, p)
  }

  test("non-slim frames and exchange.reuse=false fail LOUDLY at call time " +
    "(the r12 runtime guard: misuse must throw, never silently mis-sum)") {
    // a passthrough column consumed by neither ord nor value → throw
    val fat = df.withColumn("extra", col("v") * 2)
    val e = intercept[IllegalArgumentException] {
      RunningTotal.withRunningSum(fat, col("v"), "cum", col("id"))
    }
    assert(e.getMessage.contains("extra"), e.getMessage)
    // sort-order wrappers and computed values resolve through the guard:
    // every column is consumed → no throw (a15's exact shape)
    val (ok, _) = RunningTotal.withRunningSum(
      df, col("v") + 0L, "cum", col("v").desc, col("id").asc)
    assert(ok.columns.contains("cum"))
    // reuse disabled → throw before any plan is built
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try intercept[IllegalArgumentException] {
      RunningTotal.withRunningSum(df, col("v"), "cum", col("id"))
    } finally spark.conf.set("spark.sql.exchange.reuse", "true")
  }

  test("ntileFromRank matches ntile() for every (n, k) shape") {
    for (n <- Seq(1L, 4L, 5L, 7L, 23L, 100L); k <- Seq(2, 3, 5, 7)) {
      val rows = (1L to n).map(i => Tuple1(i)).toDF("r")
      val got = rows.select(col("r"),
          GlobalRowNumber.ntileFromRank(col("r"), n, k).as("b"))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      val want = rows.select(col("r"),
          ntile(k).over(Window.orderBy("r")).cast("long").as("b"))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(got == want, s"n=$n k=$k")
    }
  }
}
