package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpecBase {
  import spark.implicits._

  private def bruteSkyline(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.toSet

  test("frontier2D matches brute-force dominance on random points") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val df = pts.toDF("id", "x", "y")
    for (width <- Seq(1L, 50L, 100000L)) { // 1 = bucket per value; 1e5 = one bucket
      val got = Skyline.frontier2D(df, "x", "y", Seq("id"), width)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == bruteSkyline(pts), s"mismatch at bucketWidth=$width")
    }
  }

  test("duplicate frontier points all survive; dominated duplicates all drop") {
    val df = Seq(
      (1L, 10L, 10L), (2L, 10L, 10L), // tied frontier point — both kept
      (3L, 10L, 5L),                  // same x, lower y — dominated
      (4L, 5L, 12L),                  // frontier (better y)
      (5L, 4L, 12L)                   // dominated by 4 (same y, lower x)
    ).toDF("id", "x", "y")
    val ids = Skyline.frontier2D(df, "x", "y", Seq("id"), 3L)
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 4L))
  }

  test("working-column collision is rejected") {
    val df = Seq((1L, 1L, 1L)).toDF("_sky_b", "x", "y")
    val e = intercept[IllegalArgumentException](
      Skyline.frontier2D(df, "x", "y", Seq("_sky_b"), 10L))
    assert(e.getMessage.contains("_sky_b"))
  }

  test("single row and empty input are their own frontier") {
    val one = Seq((1L, 3L, 4L)).toDF("id", "x", "y")
    assert(Skyline.frontier2D(one, "x", "y", Seq("id"), 10L).count() == 1L)
    val empty = Seq.empty[(Long, Long, Long)].toDF("id", "x", "y")
    assert(Skyline.frontier2D(empty, "x", "y", Seq("id"), 10L).count() == 0L)
  }
}
