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
}
