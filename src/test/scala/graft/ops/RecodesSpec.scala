package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RecodesSpec extends SparkSpecBase {
  import spark.implicits._

  test("rangeBucket is first-match-wins on overlapping inclusive bounds") {
    val df = Seq(0.0, 100.0, 150.0, 200.0, 250.0, -5.0).toDF("v")
    val out = df
      .select(col("v"), Recodes.rangeBucket(col("v"),
        Seq((0.0, 100.0, "a"), (100.0, 200.0, "b"), (200.0, 300.0, "c")),
        lit("other")).as("b"))
      .collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(out(0.0) == "a")
    assert(out(100.0) == "a") // boundary overlaps: FIRST range wins
    assert(out(150.0) == "b")
    assert(out(200.0) == "b")
    assert(out(250.0) == "c")
    assert(out(-5.0) == "other")
  }

  test("dictDecode falls through to the original value for unmapped keys") {
    val df = Seq(1, 2, 99).toDF("k")
    val out = df.select(col("k"), Recodes.dictDecode(col("k"), Map(1 -> "one", 2 -> "two")).as("d"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == "one" && out(2) == "two" && out(99) == "99")
  }

  test("topKOrElse keeps exactly the k most frequent values, deterministic on ties") {
    val df = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq.fill(3)("z") ++ Seq("w")).toDF("c")
    val out = Recodes.topKOrElse(df, "c", 2, "OTHER")
      .groupBy("c").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // tie between y and z at count 3 → 'y' wins by value-ascending tiebreak
    assert(out("x") == 5 && out("y") == 3 && out("OTHER") == 4)
  }

  test("histBucket floors into fixed-width bins") {
    val out = Seq(0.0, 49.9, 50.0, 149.0).toDF("v")
      .select(Recodes.histBucket(col("v"), 50.0).as("b"))
      .collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(0.0, 0.0, 50.0, 100.0))
  }

  test("histBucket keeps fractional-width bins distinct (no long collapse)") {
    val out = Seq(0.2, 0.7, 1.2).toDF("v")
      .select(Recodes.histBucket(col("v"), 0.5).as("b"))
      .collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(0.0, 0.5, 1.0))
  }
}
