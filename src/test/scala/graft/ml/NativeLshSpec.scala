package graft.ml

import graft.SparkSpecBase
import org.apache.spark.ml.linalg.Vectors

class NativeLshSpec extends SparkSpecBase {
  import spark.implicits._

  // two tight clusters far apart: in-radius pairs only within a cluster
  private lazy val a = Seq(
    (1L, Vectors.dense(0.0, 0.0)), (2L, Vectors.dense(0.5, 0.0)),
    (3L, Vectors.dense(50.0, 50.0))
  ).toDF("id", "features")
  private lazy val b = Seq(
    (11L, Vectors.dense(0.2, 0.1)), (12L, Vectors.dense(49.8, 50.2)),
    (13L, Vectors.dense(200.0, -200.0))
  ).toDF("id", "features")

  test("finds in-radius cross pairs, excludes far ones, exact distances") {
    val pairs = NativeLsh.radiusJoin(a, b, "id", "features", radius = 2.0,
      bucketLength = 2.0, nTables = 3, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    // the two clusters' pairs must be found (candidates collide in some table)
    assert(byPair.contains((1L, 11L)) && byPair.contains((2L, 11L)), s"got $byPair")
    assert(byPair.contains((3L, 12L)))
    // the isolated far point pairs with no one within radius
    assert(!pairs.exists(p => p._2 == 13L))
    // distances are exact L2, one row per pair despite multi-table collisions
    assert(math.abs(byPair((1L, 11L)) - math.sqrt(0.2 * 0.2 + 0.1 * 0.1)) < 1e-9)
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
  }

  test("deterministic under a fixed seed") {
    def run() = NativeLsh.radiusJoin(a, b, "id", "features", 2.0, 2.0, 3, 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run() == run())
  }

  test("empty metadata-less left side fails with the contract error, not head()'s NoSuchElement") {
    val empty = a.filter($"id" < 0)
    val e = intercept[IllegalArgumentException] {
      NativeLsh.radiusJoin(empty, b, "id", "features", 2.0)
    }
    assert(e.getMessage.contains("pass dim explicitly"))
  }

  test("explicit dim makes an empty side legal (empty result, no probe job)") {
    val empty = a.filter($"id" < 0)
    assert(NativeLsh.radiusJoin(empty, b, "id", "features", 2.0, dim = 2).count() == 0L)
    assert(NativeLsh.radiusJoin(a, b.filter($"id" < 0), "id", "features", 2.0, dim = 2).count() == 0L)
  }

  test("vector-size metadata is used when present (no dim, empty input still works)") {
    import org.apache.spark.ml.attribute.AttributeGroup
    val meta = new AttributeGroup("features", 2).toMetadata()
    val withMeta = a.filter($"id" < 0)
      .select($"id", $"features".as("features", meta))
    assert(NativeLsh.radiusJoin(withMeta, b, "id", "features", 2.0).count() == 0L)
  }
}
