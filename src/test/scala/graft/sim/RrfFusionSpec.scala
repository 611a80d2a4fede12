package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RrfFusionSpec extends SparkSpecBase {
  import spark.implicits._

  test("rrfFuse: hand-computed fusion of two lists; double-listed ids win") {
    // list A ranks: x=1, y=2, z=3 ; list B ranks: y=1, w=2
    val a = Seq(("x", 1), ("y", 2), ("z", 3)).toDF("id", "r")
    val b = Seq(("y", 1), ("w", 2)).toDF("id", "r")
    val out = Similarity.rrfFuse(Seq(a, b), "id", "r", kConst = 60, topK = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("rrf"), r.getAs[Long]("n_lists")))).toMap
    def c(r: Int) = BigDecimal(1.0 / (60.0 + r)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    // y appears in both lists and must outrank every single-list id
    assert(out("y")._2 == 2L)
    assert(out("y")._1 == (c(2) + c(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out("x") == ((c(1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, 1L)))
    assert(out("y")._1 > out("x")._1 && out("x")._1 > out("w")._1)
  }

  test("rrfFuse: topK cut is deterministic under tied scores (id tiebreak)") {
    // two ids with identical single-list rank → identical rrf; the cut
    // must keep the lexicographically smaller id
    val a = Seq(("b", 1), ("a", 1), ("c", 2)).toDF("id", "r")
    val out = Similarity.rrfFuse(Seq(a), "id", "r", kConst = 60, topK = 2)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("a", "b"))
  }

  test("rrfFuse: fusion order of lists does not change the result") {
    val a = Seq(("x", 1), ("y", 2)).toDF("id", "r")
    val b = Seq(("y", 1), ("z", 2)).toDF("id", "r")
    val ab = Similarity.rrfFuse(Seq(a, b), "id", "r").collect().map(_.toSeq).toSet
    val ba = Similarity.rrfFuse(Seq(b, a), "id", "r").collect().map(_.toSeq).toSet
    assert(ab == ba)
  }
}
