package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpecBase {
  import spark.implicits._

  private val base = Seq(
    ("A", 10.00), ("A", 20.50), ("B", 5.25), ("B", 4.75), ("C", 100.00)
  ).toDF("g", "v")

  private def collectSnap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getAs[Long]("cnt"), r.getAs[java.math.BigDecimal]("sum_v").doubleValue))).toMap

  test("maintain(snapshot, delta) equals the full recompute") {
    val delta = Seq(
      ("D", "A", 10.00),  // delete one A row
      ("I", "A", 7.00),   // insert a new A row
      ("I", "D", 1.00)    // brand-new group
    ).toDF("op", "g", "v")
    val maintained = IncrementalAgg.maintain(
      IncrementalAgg.snapshot(base, Seq("g"), "v"), delta, Seq("g"), "v")
    val recomputed = IncrementalAgg.snapshot(
      base.filter(!($"g" === "A" && $"v" === 10.00))
        .unionByName(Seq(("A", 7.00), ("D", 1.00)).toDF("g", "v")),
      Seq("g"), "v")
    assert(collectSnap(maintained) == collectSnap(recomputed))
  }

  test("a group whose live count reaches zero drops out of the snapshot") {
    val delta = Seq(("D", "C", 100.00)).toDF("op", "g", "v")
    val out = IncrementalAgg.maintain(
      IncrementalAgg.snapshot(base, Seq("g"), "v"), delta, Seq("g"), "v")
    assert(!out.collect().map(_.getString(0)).contains("C"))
    assert(out.count() == 2L)
  }

  test("a delete+insert of the same row is a no-op") {
    val delta = Seq(("D", "B", 5.25), ("I", "B", 5.25)).toDF("op", "g", "v")
    val snap = IncrementalAgg.snapshot(base, Seq("g"), "v")
    assert(collectSnap(IncrementalAgg.maintain(snap, delta, Seq("g"), "v"))
      == collectSnap(snap))
  }
}
