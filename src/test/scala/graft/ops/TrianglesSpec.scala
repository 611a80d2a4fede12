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
}
