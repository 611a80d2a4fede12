package graft.ml

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TreeSplitSpec extends SparkSpecBase {
  import spark.implicits._

  test("splitCandidates: hand-computed Gini micros, empty right side dropped") {
    // v=1: 3 rows / 2 pos; v=2: 3 rows / 1 pos
    val df = Seq((1.0, 1), (1.0, 1), (1.0, 0), (2.0, 1), (2.0, 0), (2.0, 0))
      .toDF("x", "y")
    val out = TreeSplit.splitCandidates(df, col("y"), Seq("x" -> col("x")))
      .collect()
    assert(out.length == 1) // threshold 2.0 leaves an empty right side
    val r = out.head
    assert(r.getAs[String]("feature") == "x" && r.getAs[Double]("threshold") == 1.0)
    assert(r.getAs[Long]("n_left") == 3L && r.getAs[Long]("n_right") == 3L)
    assert(r.getAs[Long]("pos_left") == 2L && r.getAs[Long]("pos_right") == 1L)
    // gini(2/3) = 1 - (4+1)/9 -> 1e6 - round(5e6/9) = 444444 both sides
    assert(r.getAs[Long]("gini_left_micros") == 444444L)
    assert(r.getAs[Long]("gini_right_micros") == 444444L)
    assert(r.getAs[Long]("wgini_micros") == 444444L)
  }

  test("splitCandidates: a perfect separator scores 0 and wins the argmin") {
    val df = Seq((1.0, 1), (1.0, 1), (2.0, 0), (2.0, 0), (3.0, 0), (3.0, 0))
      .toDF("x", "y")
    val out = TreeSplit.splitCandidates(df, col("y"), Seq("x" -> col("x")))
      .collect().map(r => r.getAs[Double]("threshold") ->
        r.getAs[Long]("wgini_micros")).toMap
    assert(out.keySet == Set(1.0, 2.0))
    // t=1: both sides pure -> 0; t=2: left n=4 pos=2 (gini .5), right pure
    assert(out(1.0) == 0L)
    assert(out(2.0) == 333333L) // round(4*500000/6)
  }

  test("splitCandidates: side counts past the Long (pos^2+neg^2)*1e6 bound stay exact") {
    // 6e6 rows per side, pos = 2e6: the old long-arithmetic numerator
    // (4e12 + 16e12) * 1e6 = 2e19 > Long.Max would ANSI-abort; the
    // DECIMAL(38,0) form computes gini = 1 - 20/36 exactly -> 444444
    val df = spark.range(12000000L).select(
      when(col("id") < 6000000L, 1.0).otherwise(2.0).as("x"),
      (col("id") % 3 === 0).cast("int").as("y"))
    val r = TreeSplit.splitCandidates(df, col("y"), Seq("x" -> col("x")))
      .collect().head
    assert(r.getAs[Long]("n_left") == 6000000L && r.getAs[Long]("pos_left") == 2000000L)
    assert(r.getAs[Long]("gini_left_micros") == 444444L)
    assert(r.getAs[Long]("gini_right_micros") == 444444L)
    assert(r.getAs[Long]("wgini_micros") == 444444L)
  }

  test("splitCandidates: one scan serves several features; per-feature totals hold") {
    val df = Seq((1.0, 10.0, 1), (2.0, 10.0, 0), (1.0, 20.0, 1), (2.0, 20.0, 0))
      .toDF("a", "b", "y")
    val out = TreeSplit.splitCandidates(df, col("y"),
      Seq("a" -> col("a"), "b" -> col("b"))).collect()
    val byFeat = out.groupBy(_.getAs[String]("feature"))
    // feature a separates perfectly at 1.0; feature b is uninformative
    val a = byFeat("a").head
    assert(a.getAs[Long]("wgini_micros") == 0L)
    val b = byFeat("b").head
    assert(b.getAs[Long]("gini_left_micros") == 500000L &&
      b.getAs[Long]("wgini_micros") == 500000L)
  }
}
