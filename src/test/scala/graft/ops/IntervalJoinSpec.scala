package graft.ops

import graft.SparkSpecBase

class IntervalJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def pairs(a: Seq[(Long, Long, Long)], b: Seq[(Long, Long, Long)],
                    width: Long): Set[(Long, Long)] =
    IntervalJoin.overlapPairs(
      a.toDF("id", "st", "en"), b.toDF("id", "st", "en"),
      "id", "st", "en", "id", "st", "en", width)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet

  test("overlaps found, boundary touch included, disjoint excluded") {
    val a = Seq((1L, 0L, 10L), (2L, 20L, 30L))
    val b = Seq((10L, 5L, 15L),  // overlaps a1
                (11L, 10L, 12L), // touches a1 at 10 (closed interval: in)
                (12L, 31L, 40L)) // disjoint from both
    assert(pairs(a, b, width = 4L) == Set((1L, 10L), (1L, 11L)))
  }

  test("a pair spanning many shared cells is reported exactly once") {
    // both cover cells 0..25 at width 4 — the pre-dedup join sees 26 hits
    val a = Seq((1L, 0L, 100L))
    val b = Seq((10L, 0L, 100L))
    val rows = IntervalJoin.overlapPairs(
      a.toDF("id", "st", "en"), b.toDF("id", "st", "en"),
      "id", "st", "en", "id", "st", "en", 4L).collect()
    assert(rows.length == 1)
  }

  test("matches the quadratic reference join on random-ish intervals") {
    val a = (0L until 40L).map(i => (i, i * 7 % 50, i * 7 % 50 + i % 13))
    val b = (0L until 40L).map(i => (100 + i, i * 11 % 60, i * 11 % 60 + i % 9))
    val expected = (for {
      (ai, ast, aen) <- a; (bi, bst, ben) <- b
      if ast <= ben && bst <= aen
    } yield (ai, bi)).toSet
    assert(pairs(a, b, width = 8L) == expected)
    assert(pairs(a, b, width = 1L) == expected)  // width never changes the answer
    assert(pairs(a, b, width = 1000L) == expected)
  }
}
