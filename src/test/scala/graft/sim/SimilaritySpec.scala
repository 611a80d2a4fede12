package graft.sim

import graft.SparkSpecBase
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),  // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f))  // opposite of 0
  ).toDF("vec_id", "embedding")

  test("VectorOps: dot, norm, cosine on known values") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val r = df.select(
      VectorOps.dot(col("a"), col("b")).as("d"),
      VectorOps.norm(col("a")).as("n"),
      VectorOps.l2Distance(col("a"), col("b")).as("l2")
    ).collect()(0)
    assert(r.getAs[Double]("d") == 11.0)
    assert(math.abs(r.getAs[Double]("n") - math.sqrt(5.0)) < 1e-12)
    assert(math.abs(r.getAs[Double]("l2") - math.sqrt(8.0)) < 1e-12)
  }

  test("cosinePairs finds close pair, excludes orthogonal/opposite") {
    val pairs = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("bruteForceTopK ranks by cosine, excludes self, k bounds result") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0L), "vec_id", "embedding", 2)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.length == 2)
    assert(out(0).getAs[Long]("neighbor_id") == 1L) // closest
    assert(out(1).getAs[Long]("neighbor_id") == 2L) // orthogonal beats opposite
    assert(out.forall(_.getAs[Long]("neighbor_id") != 0L))
  }

  test("ivfTopK returns neighbors from probed clusters only") {
    val centroids = vecs.filter(col("vec_id") < 2)
      .select(col("vec_id").as("cluster_id"), col("embedding").as("cvec"))
    val out = Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") === 0L), centroids,
      "vec_id", "embedding", k = 3, nprobe = 2)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("neighbor_id") != 0L))
  }
}
