package graft.ops

import graft.SparkSpecBase

class TrianglesSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): (Long, Long) = {
    val r = Triangles.triangleCount(edges.toDF("src", "dst"), "src", "dst").collect()(0)
    (r.getAs[Long]("n_edges"), r.getAs[Long]("n_triangles"))
  }

  test("K4 has 6 edges and 4 triangles") {
    val k4 = for (i <- 1L to 4L; j <- 1L to 4L if i < j) yield (i, j)
    assert(run(k4) == (6L, 4L))
  }

  test("a path has no triangles; closing it into a cycle adds none (n>3)") {
    val path = (1L until 5L).map(i => (i, i + 1))
    assert(run(path) == (4L, 0L))
    assert(run(path :+ ((5L, 1L))) == (5L, 0L))
  }

  test("triangle with a pendant: exactly one triangle") {
    assert(run(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))) == (4L, 1L))
  }

  test("self-loops, duplicates and reversed edges are cleaned") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), (2L, 3L), (1L, 3L))
    assert(run(messy) == (3L, 1L))
  }

  test("a star hub has wedges but zero triangles") {
    val star = (2L to 8L).map(i => (1L, i))
    assert(run(star) == (7L, 0L))
  }

  private def cn(edges: Seq[(Long, Long)], maxDeg: Int, minCommon: Long) =
    Triangles.commonNeighbors(edges.toDF("src", "dst"), "src", "dst", maxDeg, minCommon)
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) -> r.getAs[Long]("common_cnt"))
      .toMap

  test("commonNeighbors finds non-adjacent pairs through shared centers") {
    // 1 and 4 share centers 2 and 3; (1,4) is NOT an edge -> candidate.
    // 2 and 3 share centers 1 and 4 but ARE adjacent -> excluded.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (2L, 3L))
    val out = cn(edges, maxDeg = 10, minCommon = 2L)
    assert(out == Map((1L, 4L) -> 2L))
  }

  test("commonNeighbors: hub centers beyond maxDeg mint no candidates") {
    // star: every leaf pair shares only the hub; capping the hub's degree
    // out removes all candidates
    val star = (2L to 8L).map(i => (1L, i))
    assert(cn(star, maxDeg = 10, minCommon = 1L).nonEmpty)
    assert(cn(star, maxDeg = 6, minCommon = 1L).isEmpty)
  }

  test("commonNeighbors: minCommon threshold filters single-wedge pairs") {
    // 1-2-4 single wedge through 2; with minCommon=2 nothing qualifies
    val edges = Seq((1L, 2L), (2L, 4L))
    assert(cn(edges, maxDeg = 10, minCommon = 1L) == Map((1L, 4L) -> 1L))
    assert(cn(edges, maxDeg = 10, minCommon = 2L).isEmpty)
  }

  test("linkRA: integer micro-weights 1e6/deg, hubs discounted, adjacency excluded") {
    // K(2,2): centers 10, 20 each adjacent to 1 and 2; nothing else
    val edges = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L))
      .toDF("src", "dst")
    val got = graft.ops.Triangles.linkRA(edges, "src", "dst",
        maxDeg = 10, minCommon = 2L)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        ((r.getAs[Long]("common_cnt"), r.getAs[Long]("ra_micros")))).toMap
    // (1,2) via {10,20} (deg 2 each) and (10,20) via {1,2} (deg 2 each):
    // both score 2 * round(1e6/2) = 1_000_000; all four true edges excluded
    assert(got === Map((1L, 2L) -> ((2L, 1000000L)), (10L, 20L) -> ((2L, 1000000L))))
  }

  test("linkRA: a degree-3 common neighbor contributes round(1e6/3) = 333333") {
    // center 10 -> {1, 2, 3}: wedge pairs (1,2),(1,3),(2,3) each weight 333333
    val edges = Seq((10L, 1L), (10L, 2L), (10L, 3L)).toDF("src", "dst")
    val got = graft.ops.Triangles.linkRA(edges, "src", "dst",
        maxDeg = 10, minCommon = 1L)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        r.getAs[Long]("ra_micros")).toMap
    assert(got === Map((1L, 2L) -> 333333L, (1L, 3L) -> 333333L, (2L, 3L) -> 333333L))
  }
}
