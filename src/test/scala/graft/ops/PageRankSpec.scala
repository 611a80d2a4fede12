package graft.ops

import graft.SparkSpecBase

class PageRankSpec extends SparkSpecBase {
  import spark.implicits._

  // undirected triangle + a pendant node attached to node 1:
  // 1↔2, 2↔3, 1↔3, 1↔4
  private val edges = Seq(
    (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L), (1L, 4L), (4L, 1L)
  ).toDF("src", "dst")

  test("fixedPoint conserves total mass within truncation loss") {
    val out = PageRank.fixedPoint(edges, "src", "dst", iters = 3)
      .collect().map(_.getAs[Long]("pr_e12"))
    assert(out.length == 4)
    val total = out.sum
    // every div truncates at e-12; with 4 nodes × 3 iterations the loss
    // is bounded by a few hundred units of 1e-12
    assert(total <= 1000000000000L && total > 999999999000L, s"total $total")
  }

  test("fixedPoint ranks the hub above peripheral nodes") {
    val out = PageRank.fixedPoint(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr_e12")).toMap
    assert(out(1L) > out(2L)) // hub (degree 3) beats triangle members
    assert(out(2L) == out(3L)) // symmetric pair identical — exact arithmetic
    assert(out(4L) < out(2L)) // pendant is weakest
  }

  test("fixedPoint matches a hand-rolled single iteration") {
    val out = PageRank.fixedPoint(edges, "src", "dst", iters = 1)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr_e12")).toMap
    // pr0 = 250e9 each; deg = (1→3, 2→2, 3→2, 4→1)
    val p0 = 1000000000000L / 4
    val base = 150000000000L / 4
    def damp(s: Long) = base + (85 * s) / 100
    val w1 = p0 / 3; val w2 = p0 / 2; val w3 = p0 / 2; val w4 = p0 / 1
    assert(out(1L) == damp(w2 + w3 + w4))
    assert(out(2L) == damp(w1 + w3))
    assert(out(3L) == damp(w1 + w2))
    assert(out(4L) == damp(w1))
  }

  test("fixedPoint is partitioning-invariant (integer arithmetic)") {
    val a = PageRank.fixedPoint(edges.repartition(1), "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.fixedPoint(edges.repartition(5), "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
