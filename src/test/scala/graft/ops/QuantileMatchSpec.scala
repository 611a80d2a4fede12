package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class QuantileMatchSpec extends SparkSpecBase {
  import spark.implicits._

  test("matchQuantiles maps extremes to extremes and midpoints by interpolation") {
    val a = Seq((1L, 0.0), (2L, 50.0), (3L, 100.0)).toDF("id", "v")
    val b = Seq((11L, 1000.0), (12L, 2000.0), (13L, 4000.0)).toDF("id", "v")
    val got = QuantileMatch.matchQuantiles(a, b, "id", "v")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("v_matched")).toMap
    assert(got(1L) == 1000.0) // p=0   → B min
    assert(got(2L) == 2000.0) // p=0.5 → B's middle order stat exactly
    assert(got(3L) == 4000.0) // p=1   → B max (hi-edge coalesce)
  }

  test("matchQuantiles interpolates between reference order statistics") {
    // A has 5 rows → p ∈ {0, .25, .5, .75, 1}; B has 2 rows (10, 20):
    // pos = p·1, so matched = 10 + 10·p
    val a = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0), (5L, 5.0)).toDF("id", "v")
    val b = Seq((11L, 10.0), (12L, 20.0)).toDF("id", "v")
    val got = QuantileMatch.matchQuantiles(a, b, "id", "v")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("v_matched")).toMap
    assert(got == Map(1L -> 10.0, 2L -> 12.5, 3L -> 15.0, 4L -> 17.5, 5L -> 20.0))
  }

  test("matchQuantiles preserves order: larger input values never map lower") {
    val a = (1 to 40).map(i => (i.toLong, (i * 7 % 23).toDouble)).toDF("id", "v")
    val b = (1 to 17).map(i => (i.toLong, (i * i).toDouble)).toDF("id", "v")
    val rows = QuantileMatch.matchQuantiles(a, b, "id", "v")
      .orderBy("v", "id").collect().map(_.getAs[Double]("v_matched"))
    assert(rows.zip(rows.tail).forall { case (x, y) => x <= y })
  }

  test("matchQuantiles rejects degenerate sides") {
    val one = Seq((1L, 1.0)).toDF("id", "v")
    val two = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      QuantileMatch.matchQuantiles(one, two, "id", "v")
    }
  }
}
