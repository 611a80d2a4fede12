package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class QuantizedSpec extends SparkSpecBase {
  import spark.implicits._

  // 4-dim corpus: id 0/1 nearly parallel, 2 orthogonal, 3 opposite, 4 zero
  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("sq8TopK ranks like float cosine on well-separated vectors") {
    val out = Quantized.sq8TopK(vecs, "vec_id", "embedding", nQueries = 1, k = 3)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.map(_.getAs[Long]("query_id")).forall(_ == 0L))
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L, 3L))
    // parallel ≈ 1, orthogonal = 0, opposite = -1 survive quantization
    assert(math.abs(out(0).getAs[Double]("qcos") - 1.0) < 0.02)
    assert(math.abs(out(1).getAs[Double]("qcos")) < 1e-12)
    assert(math.abs(out(2).getAs[Double]("qcos") + 1.0) < 1e-12)
  }

  test("sq8TopK: zero vector ranks last (null qcos) and never NPEs") {
    val out = Quantized.sq8TopK(vecs, "vec_id", "embedding", nQueries = 1, k = 4)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.length == 4)
    assert(out(3).getAs[Long]("neighbor_id") == 4L)
    assert(out(3).isNullAt(out(3).fieldIndex("qcos")))
  }

  // 32-dim sign-pattern corpus for binary quantization: 0 = query (all
  // positive), 1 = same signs, 5 = two sign flips, 2 = half flipped,
  // 3 = all flipped, 4 = zero vector
  private val bqVecs = {
    val ones = Array.fill(32)(1.0f)
    Seq(
      (0L, ones),
      (1L, ones.map(_ * 0.5f)),
      (2L, Array.tabulate(32)(i => if (i < 16) 1.0f else -1.0f)),
      (3L, ones.map(-_)),
      (4L, Array.fill(32)(0.0f)),
      (5L, Array.tabulate(32)(i => if (i == 0 || i == 31) -1.0f else 1.0f))
    ).toDF("vec_id", "embedding")
  }

  test("bqTopK: hamming = flipped sign count, rerank by exact cosine, nulls last") {
    val out = Quantized.bqTopK(bqVecs, "vec_id", "embedding",
        dim = 32, nQueries = 1, shortlist = 5, k = 5)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 5L, 2L, 3L, 4L))
    val ham = out.map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Long]("hamming")).toMap
    assert(ham == Map(1L -> 0L, 5L -> 2L, 2L -> 16L, 3L -> 32L, 4L -> 32L))
    assert(math.abs(out(0).getAs[Double]("cos") - 1.0) < 1e-12)
    assert(math.abs(out(1).getAs[Double]("cos") - 0.875) < 1e-12)
    assert(math.abs(out(2).getAs[Double]("cos")) < 1e-12)
    assert(math.abs(out(3).getAs[Double]("cos") + 1.0) < 1e-12)
    assert(out(4).isNullAt(out(4).fieldIndex("cos")))
  }

  test("bqTopK: the hamming shortlist prunes before the float re-rank") {
    val out = Quantized.bqTopK(bqVecs, "vec_id", "embedding",
        dim = 32, nQueries = 1, shortlist = 1, k = 1).collect()
    assert(out.length == 1 && out.head.getAs[Long]("neighbor_id") == 1L)
  }

  test("bqTopK rejects dim not a multiple of 32 and shortlist < k") {
    intercept[IllegalArgumentException] {
      Quantized.bqTopK(vecs, "vec_id", "embedding", 4, 1, 4, 2)
    }
    intercept[IllegalArgumentException] {
      Quantized.bqTopK(bqVecs, "vec_id", "embedding", 32, 1, 2, 5)
    }
  }

  test("pqTopK with codebook = corpus reproduces exact dot ranking") {
    // nCodes covers every vector, so each sub-vector encodes to itself and
    // ADC degenerates to the exact dot product — ranking must match brute
    // force by dot (all norms here are ~1 except the zero vector)
    val out = Quantized.pqTopK(vecs, "vec_id", "embedding",
      dim = 4, m = 2, nCodes = 5, nQueries = 1, k = 4)
      .collect().sortBy(_.getAs[Int]("rank"))
    // dots vs query 0: v1=0.9, v2=0.0, v4=0.0 (tie broken by id), v3=-1.0
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L, 4L, 3L))
    assert(math.abs(out(0).getAs[Double]("adc") - 0.9) < 1e-6) // 0.9f widened
    assert(math.abs(out(1).getAs[Double]("adc")) < 1e-12)
    assert(math.abs(out(3).getAs[Double]("adc") + 1.0) < 1e-12)
  }

  test("pqRecall is k for a self-coding codebook, and bounded by k always") {
    val full = Quantized.pqRecall(vecs, "vec_id", "embedding",
      dim = 4, m = 2, nCodes = 5, nQueries = 1, k = 2)
      .collect()
    assert(full.length == 1 && full(0).getAs[Long]("n_hits") == 2L)
    val coarse = Quantized.pqRecall(vecs, "vec_id", "embedding",
      dim = 4, m = 2, nCodes = 2, nQueries = 2, k = 2)
      .collect()
    assert(coarse.length == 2)
    assert(coarse.forall { r =>
      val h = r.getAs[Long]("n_hits"); h >= 0L && h <= 2L
    })
  }

  test("ivfPqRecall: k everywhere under full probe + unbounded rerank, " +
    "bounded by k at the lossy production config") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val full = Quantized.ivfPqRecall(emb, "vec_id", "embedding",
      dim = 64, m = 8, nCodes = 16, nPivots = 8, nprobe = 8,
      nQueries = 5, rerank = 1000, k = 5).collect()
    assert(full.length == 5 && full.forall(_.getAs[Long]("n_hits") == 5L),
      "full probe + full rerank must recover the exact top-k")
    val lossy = Quantized.ivfPqRecall(emb, "vec_id", "embedding",
      dim = 64, m = 8, nCodes = 16, nPivots = 16, nprobe = 2,
      nQueries = 5, rerank = 20, k = 5).collect()
    assert(lossy.length == 5 && lossy.forall { r =>
      val h = r.getAs[Long]("n_hits"); h >= 0L && h <= 5L
    })
  }

  test("pqTopK rejects dim not divisible by m") {
    intercept[IllegalArgumentException] {
      Quantized.pqTopK(vecs, "vec_id", "embedding",
        dim = 4, m = 3, nCodes = 2, nQueries = 1, k = 1)
    }
  }

  test("mmrRerank demotes an exact duplicate below a diverse candidate") {
    // c1 and c2 are identical; c3 is equally relevant but on the other
    // side of the query. Pure relevance would emit 1,2 first; MMR must
    // pick the duplicate LAST: its step-2 score is 0.5·rel − 0.5·1 < the
    // diverse candidate's 0.5·rel − 0.5·0.976
    val mvecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),  // query
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),  // exact dup of 1
      (3L, Array(0.9f, -0.1f, 0.0f, 0.0f))  // same rel, diverse direction
    ).toDF("vec_id", "embedding")
    val out = Quantized.mmrRerank(mvecs, "vec_id", "embedding",
      nQueries = 1, nCand = 3, k = 3)
      .collect().sortBy(_.getAs[Int]("step"))
    assert(out.map(_.getAs[Long]("sel_id")).toSeq == Seq(1L, 3L, 2L))
    // step-1 score is the raw relevance; later steps are penalized
    assert(out(0).getAs[Double]("score") > 0.99)
    assert(out(2).getAs[Double]("score") < out(1).getAs[Double]("score"))
  }

  test("ivfPqTopK with full probing + unbounded rerank equals brute force") {
    // nprobe = nPivots means every inverted list is probed, and rerank ≥
    // |corpus| re-scores every candidate exactly — the approximate path
    // must then return the EXACT brute-force top-k, whatever the ADC said
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ivfpq = Quantized.ivfPqTopK(emb, "vec_id", "embedding",
      dim = 64, m = 8, nCodes = 16, nPivots = 8, nprobe = 8,
      nQueries = 5, rerank = 1000, k = 5)
      .select("query_id", "neighbor_id", "rank")
    val embD = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val bf = Similarity.bruteForceTopK(embD, embD.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank")
    assert(ivfpq.exceptAll(bf).isEmpty && bf.exceptAll(ivfpq).isEmpty)
  }

  test("ivfPqTopK emits at most k rows per query with dense ranks") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val out = Quantized.ivfPqTopK(emb, "vec_id", "embedding",
      dim = 64, m = 8, nCodes = 16, nPivots = 16, nprobe = 2,
      nQueries = 5, rerank = 10, k = 3).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.values.forall(_.length <= 3))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq ==
        (1 to rows.length).toSeq)
    }
  }
}
