package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BfsSpec extends SparkSpecBase {
  import spark.implicits._

  // 1 → 2 → 3 → 4 → 5 (chain), plus a shortcut 1 → 4 and an island 9 → 10
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L), (9L, 10L)
  ).toDF("src", "dst")

  test("kHopDistances takes the shortest path, not the first found") {
    val seeds = Seq(1L).toDF("node")
    val d = Bfs.kHopDistances(edges, "src", "dst", seeds, "node", maxHops = 3)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Int]("dist")).toMap
    assert(d == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))
    // node 5 via the chain alone would be 4 hops; the 1→4 shortcut makes it 2.
    // the island (9, 10) must be absent, not present-with-large-dist
  }

  test("kHopDistances bounds the horizon at maxHops") {
    val seeds = Seq(1L).toDF("node")
    val d1 = Bfs.kHopDistances(edges, "src", "dst", seeds, "node", maxHops = 1)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Int]("dist")).toMap
    assert(d1 == Map(1L -> 0, 2L -> 1, 4L -> 1))
  }

  test("kHopDistances merges multiple seeds by min distance") {
    val seeds = Seq(3L, 9L).toDF("node")
    val d = Bfs.kHopDistances(edges, "src", "dst", seeds, "node", maxHops = 2)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Int]("dist")).toMap
    assert(d == Map(3L -> 0, 9L -> 0, 4L -> 1, 10L -> 1, 5L -> 2))
  }
}
