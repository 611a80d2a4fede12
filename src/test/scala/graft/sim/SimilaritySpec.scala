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

  // 40 seeded random unit-ish vectors + 10 noisy near-copies (cos ≈ 0.999)
  private def plantedCorpus() = {
    val rnd = new scala.util.Random(7)
    val base = (0 until 40).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val dups = (0 until 10).map { i =>
      (100L + i, base(i)._2.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    (base ++ dups).toDF("vec_id", "embedding")
  }

  test("rhpNearDupPairs: full recall on planted near-dups, subset of exact pairs") {
    val corpus = plantedCorpus()
    val lsh = Similarity.rhpNearDupPairsAuto(corpus, "vec_id", "embedding",
      dim = 16, threshold = 0.95)
      .collect().map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("dup_id"))).toSet
    val exact = Similarity.cosinePairs(corpus, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // precision is exact by construction (candidates are cosine-verified)
    assert(lsh.subsetOf(exact))
    // at cos≈0.999 the per-pair miss probability is ~1e-5 — all planted
    // pairs must surface through the band join
    val planted = (0 until 10).map(i => (i.toLong, 100L + i)).toSet
    assert(planted.subsetOf(lsh), s"missed planted dups: ${planted -- lsh}")
  }

  test("rhpNearDupOracleSql is deterministic and embeds the sign matrix") {
    val a = Similarity.rhpNearDupOracleSql("embeddings", "vec_id", "embedding", 64, 0.45)
    val b = Similarity.rhpNearDupOracleSql("embeddings", "vec_id", "embedding", 64, 0.45)
    assert(a == b)
    assert(a.contains("UNION ALL") && a.contains("list_sum"))
  }

  test("kmeansCentroids + ivfTopK: recall vs brute force pinned on testdata") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val centroids = Similarity.kmeansCentroids(emb, "embedding", k = 8)
    assert(centroids.count() == 8)
    val ivf = Similarity.ivfTopK(emb, queries, centroids, "vec_id", "embedding", k = 5, nprobe = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    // unclustered gaussian test vectors are IVF's worst case; on real
    // (clustered) embeddings recall at nprobe/nClusters=3/8 is far higher
    info(s"IVF recall@5 nprobe=3/8: $recall")
    assert(recall >= 0.5, s"recall dropped to $recall")
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

  test("prefixRerankTopK reranks prefix candidates by full cosine") {
    // query 0 = (1,0,0); vec 9 has a perfect 2-dim PREFIX match but a huge
    // third component, so stage 1 ranks it first and the full-dim rerank
    // must demote it below vec 1
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (9L, Array(1.0f, 0.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.prefixRerankTopK(df, "vec_id", "embedding",
      prefixDim = 2, nQueries = 1, k = 2, overfetch = 2)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 9L))
    // and the candidate cut is real: with overfetch=1 (k×1=2 candidates by
    // prefix: vecs 9 and 1), vec 2 can never appear
    val tight = Similarity.prefixRerankTopK(df, "vec_id", "embedding",
      prefixDim = 2, nQueries = 1, k = 2, overfetch = 1)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(tight == Set(1L, 9L))
  }

  test("hardNegatives excludes same-label vectors and ranks the rest") {
    // query 0 (label 1): vec 1 is nearly identical but SAME label — must
    // be excluded; among different-label vecs, 2 (cos≈0.98) beats 3 (⊥)
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(0.99f, 0.01f), 1),
      (2L, Array(0.9f, 0.2f), 2),
      (3L, Array(0.0f, 1.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(df, df.filter($"vec_id" === 0L),
      "vec_id", "embedding", "label", k = 2)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 3L))
    assert(out.forall(_.getAs[Long]("query_id") == 0L))
  }
}
