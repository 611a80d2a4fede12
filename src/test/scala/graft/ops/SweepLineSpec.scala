package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions.col

class SweepLineSpec extends SparkSpecBase {
  import spark.implicits._

  test("peakConcurrency finds the max overlap and its earliest instant") {
    // overlap picture:  [10,20) [15,25) [18,30) → 3 open at t=18..19
    //                   [40,50) [49,60)         → 2 open at t=49
    val spans = Seq((10L, 20L), (15L, 25L), (18L, 30L), (40L, 50L), (49L, 60L))
      .toDF("st", "en")
    val out = SweepLine.peakConcurrency(spans, col("st"), col("en")).collect().head
    assert(out.getAs[Long]("peak") == 3L)
    assert(out.getAs[Long]("at_epoch") == 18L)
  }

  test("peakConcurrency: touching spans [a,b) [b,c) do not overlap") {
    val spans = Seq((0L, 10L), (10L, 20L)).toDF("st", "en")
    val out = SweepLine.peakConcurrency(spans, col("st"), col("en")).collect().head
    assert(out.getAs[Long]("peak") == 1L)
    assert(out.getAs[Long]("at_epoch") == 0L)
  }

  test("peakConcurrency ties resolve to the EARLIEST attaining instant") {
    // two disjoint 2-high plateaus; the first (t=5) must win
    val spans = Seq((5L, 8L), (5L, 8L), (20L, 30L), (25L, 40L)).toDF("st", "en")
    val out = SweepLine.peakConcurrency(spans, col("st"), col("en")).collect().head
    assert(out.getAs[Long]("peak") == 2L)
    assert(out.getAs[Long]("at_epoch") == 5L)
  }

  test("peakConcurrency is partitioning-invariant (distributed cumsum)") {
    val base = (1 to 300).map(i => ((i % 37).toLong, (i % 37 + 1 + i % 5).toLong))
    val one = SweepLine.peakConcurrency(base.toDF("st", "en").coalesce(1),
      col("st"), col("en")).collect().head
    val many = SweepLine.peakConcurrency(base.toDF("st", "en").repartition(7),
      col("st"), col("en")).collect().head
    assert(one.getAs[Long]("peak") == many.getAs[Long]("peak"))
    assert(one.getAs[Long]("at_epoch") == many.getAs[Long]("at_epoch"))
  }
}
