package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  // quotes (right): key, time, value
  private lazy val quotes = Seq(
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 15L, 10.0)
  ).toDF("qk", "qt", "px")

  // trades (left): key, time
  private lazy val trades = Seq(
    ("a", 5L),  // before any quote → null
    ("a", 10L), // exactly at a quote time → inclusive match (1.0)
    ("a", 25L), // between 20 and 30 → 2.0
    ("a", 99L), // after all → 3.0
    ("b", 15L), // other key, exact tie → 10.0
    ("c", 50L)  // key with no quotes at all → null
  ).toDF("tk", "tt")

  private def result(): Map[(String, Long), Option[Double]] =
    AsOfJoin.backward(trades, "tk", "tt", quotes, "qk", "qt", Seq("px"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  test("backward asof: latest right value at-or-before each left time, per key") {
    val got = result()
    assert(got(("a", 5L)).isEmpty)
    assert(got(("a", 10L)).contains(1.0)) // equal time is inclusive
    assert(got(("a", 25L)).contains(2.0))
    assert(got(("a", 99L)).contains(3.0))
    assert(got(("b", 15L)).contains(10.0))
    assert(got(("c", 50L)).isEmpty)
    assert(got.size == 6) // left join: every left row exactly once
  }

  test("forward asof: earliest right value at-or-after each left time, per key") {
    val out = AsOfJoin.forward(trades, "tk", "tt", quotes, "qk", "qt", Seq("px"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(out(("a", 5L)) == Some(1.0))   // next quote at 10
    assert(out(("a", 10L)) == Some(1.0))  // exact tie: inclusive
    assert(out(("a", 25L)) == Some(3.0))  // next quote at 30
    assert(out(("a", 99L)) == None)       // nothing after
    assert(out(("b", 15L)) == Some(10.0))
    assert(out(("c", 50L)) == None)
  }

  test("matches the brute-force per-row maximum (property over random data)") {
    val rnd = new scala.util.Random(42)
    val l = (1 to 200).map(i => (s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong, i))
      .toDF("k", "t", "id")
    val r = (1 to 60).map(i => (s"k${rnd.nextInt(6)}", rnd.nextInt(100).toLong * 2, i.toDouble))
      .groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq // unique (key, time)
      .toDF("rk", "rt", "v")
    val got = AsOfJoin.backward(l, "k", "t", r, "rk", "rt", Seq("v"))
      .collect().map(x => x.getInt(2) -> (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
    val rRows = r.collect().map(x => (x.getString(0), x.getLong(1), x.getDouble(2)))
    val lRows = l.collect().map(x => (x.getString(0), x.getLong(1), x.getInt(2)))
    lRows.foreach { case (k, t, id) =>
      val want = rRows.filter(q => q._1 == k && q._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(id) == want, s"row $id key=$k t=$t")
    }
  }

  test("one shuffle: union + single window partitioning, no nested loop") {
    for (dir <- Seq("backward", "forward")) {
      val df =
        if (dir == "backward") AsOfJoin.backward(trades, "tk", "tt", quotes, "qk", "qt", Seq("px"))
        else AsOfJoin.forward(trades, "tk", "tt", quotes, "qk", "qt", Seq("px"))
      df.collect()
      val tree = df.queryExecution.executedPlan.toString
      assert(!tree.contains("NestedLoop"), s"$dir:\n$tree")
      assert(!tree.contains("CartesianProduct"), s"$dir:\n$tree")
    }
  }

  test("nearest picks the closer side and prefers backward on exact ties") {
    import spark.implicits._
    val l = Seq((1L, 100L), (1L, 200L), (1L, 305L), (2L, 50L))
      .toDF("k", "t") // user 2 has no right rows at all
    val r = Seq((1L, 90L, "a"), (1L, 210L, "b"), (1L, 300L, "c"))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.nearest(l, "k", "t", r, "k", "rt", Seq("v"))
      .collect().map(row => (row.getAs[Long]("k"), row.getAs[Long]("t")) ->
        (Option(row.getAs[String]("v")), Option(row.getAs[Any]("matched_t")))).toMap
    assert(out((1L, 100L)) == (Some("a"), Some(90L)))  // 10 back vs 110 fwd
    // t=200: 110 back (90) vs 10 fwd (210) -> forward
    assert(out((1L, 200L)) == (Some("b"), Some(210L)))
    assert(out((1L, 305L)) == (Some("c"), Some(300L))) // 5 back, nothing fwd
    assert(out((2L, 50L)) == (None, None))             // no right rows
    val tie = AsOfJoin.nearest(
      Seq((1L, 100L)).toDF("k", "t"),
      "k", "t",
      Seq((1L, 90L, "back"), (1L, 110L, "fwd")).toDF("k", "rt", "v"),
      "k", "rt", Seq("v")).collect().head
    assert(tie.getAs[String]("v") == "back") // equal 10s distance -> backward
  }

  test("inputs carrying _asof_* working columns are rejected, not corrupted") {
    import spark.implicits._
    val poisonedLeft = trades.withColumnRenamed("tt", "_asof_t")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.backward(poisonedLeft, "tk", "_asof_t", quotes, "qk", "qt", Seq("px"))
    }
    assert(e1.getMessage.contains("_asof_t"))
    val poisonedRight = quotes.withColumn("_asof_side", org.apache.spark.sql.functions.lit(9))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.backward(trades, "tk", "tt", poisonedRight, "qk", "qt", Seq("px"))
    }
    assert(e2.getMessage.contains("_asof_side"))
  }
}
