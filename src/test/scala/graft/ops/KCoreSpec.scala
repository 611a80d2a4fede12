package graft.ops

import graft.SparkSpecBase

class KCoreSpec extends SparkSpecBase {
  import spark.implicits._

  test("2-core: pendant chain peels away over rounds, triangle survives") {
    // triangle 1-2-3 with a chain 3-4-5 hanging off
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    // round 1 drops node 5 (deg 1); round 2 drops 4 (deg fell to 1)
    val r1 = KCore.peel(edges, k = 2, rounds = 1)
      .collect().map(r => r.getAs[Long]("node")).toSet
    assert(r1 === Set(1L, 2L, 3L, 4L)) // 4 still had deg 2 at round 1
    val r2 = KCore.peel(edges, k = 2, rounds = 2)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("degree")).toMap
    assert(r2.keySet === Set(1L, 2L, 3L))
    assert(r2.values.forall(_ == 2L))
    // fixpoint: further rounds change nothing
    val r3 = KCore.peel(edges, k = 2, rounds = 3)
      .collect().map(r => r.getAs[Long]("node")).toSet
    assert(r3 === Set(1L, 2L, 3L))
  }

  test("k above the max degree empties the graph in one round") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(KCore.peel(edges, k = 5, rounds = 1).count() === 0L)
  }
}
