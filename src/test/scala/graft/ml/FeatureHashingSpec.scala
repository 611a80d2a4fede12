package graft.ml

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class FeatureHashingSpec extends SparkSpecBase {
  import spark.implicits._

  private def df = Seq(
    (1L, "AUTO", 7),
    (2L, "AUTO", 7),
    (3L, "HOUSE", 9),
    (4L, null.asInstanceOf[String], 7)
  ).toDF("id", "seg", "nk")

  test("buckets are in range, deterministic, and identical rows hash identically") {
    val out = FeatureHashing.hashedFeatures(df, "id", Seq("seg", "nk"), buckets = 16)
    val rows = out.collect()
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b < 16
    })
    val byId = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("weight"))).toSet).toMap
    // ids 1 and 2 carry identical feature values → identical hashed vectors
    assert(byId(1L) == byId(2L))
    assert(byId(1L) != byId(3L))
    // re-running produces the same buckets (no RNG anywhere)
    val again = FeatureHashing.hashedFeatures(df, "id", Seq("seg", "nk"), buckets = 16)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("weight"))).toSet).toMap
    assert(byId == again)
  }

  test("null feature values contribute nothing") {
    val out = FeatureHashing.hashedFeatures(df, "id", Seq("seg", "nk"), buckets = 16)
      .filter(col("id") === 4L).collect()
    // id 4 has seg=null: only the nk entry remains
    assert(out.map(_.getAs[Long]("weight")).map(math.abs).sum == 1L)
  }

  test("weights are signed unit sums; same column value in a different column hashes differently") {
    val d2 = Seq((1L, "7", 7)).toDF("id", "a", "b")
    val out = FeatureHashing.hashedFeatures(d2, "id", Seq("a", "b"), buckets = 4096)
      .collect()
    // "a=7" and "b=7" are distinct features — with 4096 buckets a collision
    // would require md5("a=7") ≡ md5("b=7") (mod 4096); they differ
    assert(out.length == 2)
    assert(out.forall(r => math.abs(r.getAs[Long]("weight")) == 1L))
  }
}
