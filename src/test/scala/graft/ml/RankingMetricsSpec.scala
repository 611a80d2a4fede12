package graft.ml

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RankingMetricsSpec extends SparkSpecBase {
  import spark.implicits._

  // one "query" group g: scores rank ids 1..5 descending; rel at ranks 1, 3
  private def ranked = Seq(
    ("g", 1L, 50.0, 1), ("g", 2L, 40.0, 0), ("g", 3L, 30.0, 1),
    ("g", 4L, 20.0, 0), ("g", 5L, 10.0, 0)
  ).toDF("grp", "id", "score", "rel")

  test("ndcgAtK matches the hand-computed DCG/IDCG for binary relevance") {
    val out = RankingMetrics.ndcgAtK(ranked, "grp", "score", "id",
      col("rel") === 1, k = 10).collect()
    assert(out.length == 1)
    val r = out.head
    // DCG = 1/log2(2) + 1/log2(4) = 1 + 0.5 → micro 1500000
    assert(r.getAs[Long]("dcg_micro") == 1500000L)
    // IDCG (pool): positives at ideal ranks 1,2 → 1 + 1/log2(3)
    val idcg = 1000000L + math.round(1e6 / (math.log(3.0) / math.log(2.0)))
    assert(r.getAs[Long]("idcg_micro") == idcg)
    assert(math.abs(r.getAs[Double]("ndcg") - 1500000.0 / idcg) < 1e-6)
  }

  test("ndcgAtK: a group with no relevant rows emits ndcg = 0, not a dropped row") {
    val df = Seq(("a", 1L, 5.0, 1), ("b", 2L, 5.0, 0)).toDF("grp", "id", "score", "rel")
    val out = RankingMetrics.ndcgAtK(df, "grp", "score", "id", col("rel") === 1, 10)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Double]("ndcg")).toMap
    assert(out == Map("a" -> 1.0, "b" -> 0.0))
  }

  test("ndcgAtK ignores relevant rows below the k cutoff") {
    // rel row at rank 3 with k=2 contributes to neither DCG nor the pool
    val out = RankingMetrics.ndcgAtK(ranked, "grp", "score", "id",
      col("rel") === 1, k = 2).collect().head
    assert(out.getAs[Long]("dcg_micro") == 1000000L) // only the rank-1 hit
    assert(out.getAs[Long]("idcg_micro") == 1000000L)
    assert(out.getAs[Double]("ndcg") == 1.0)
  }

  test("mrr reports the first relevant rank per group") {
    val df = Seq(
      ("a", 1L, 9.0, 0), ("a", 2L, 8.0, 0), ("a", 3L, 7.0, 1),
      ("b", 4L, 9.0, 1)
    ).toDF("grp", "id", "score", "rel")
    val out = RankingMetrics.mrr(df, "grp", "score", "id", col("rel") === 1)
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Int]("first_rel_rank"), r.getAs[Double]("rr")))).toMap
    assert(out("a") == ((3, 0.333333)))
    assert(out("b") == ((1, 1.0)))
  }

  test("mapAtK: hand-computed AP, zero-positive groups, and beyond-k positives") {
    val df = Seq(
      // group a, ranks by score desc: id1 id2 id3(rel) id4 →
      // AP@3 = (1/3) / min(3, R=1) = 0.333333
      ("a", 1L, 9.0, 0), ("a", 2L, 8.0, 0), ("a", 3L, 7.0, 1), ("a", 4L, 6.0, 0),
      // group d: positives at ranks 1,2 → AP@3 = (1/1 + 2/2) / 2 = 1.0
      ("d", 9L, 9.0, 1), ("d", 10L, 8.0, 1), ("d", 11L, 7.0, 0),
      // group b: no positives → ap 0
      ("b", 5L, 9.0, 0),
      // group c: only positive OUTSIDE top-3 → counted in R, ap = 0
      ("c", 6L, 9.0, 0), ("c", 7L, 8.0, 0), ("c", 8L, 7.0, 0), ("c", 12L, 6.0, 1)
    ).toDF("grp", "id", "score", "rel")
    val out = RankingMetrics.mapAtK(df, "grp", "score", "id", col("rel") === 1, k = 3)
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("n_rel"), r.getAs[Double]("ap")))).toMap
    assert(out("a") == ((1L, 0.333333)))
    assert(out("d") == ((2L, 1.0)))
    assert(out("b") == ((0L, 0.0)))
    assert(out("c") == ((1L, 0.0)))
  }

  test("logLoss is near zero for confident-correct and large for confident-wrong") {
    val df = Seq(
      ("good", 0.999, 1), ("good", 0.001, 0),
      ("bad", 0.001, 1), ("bad", 0.999, 0)
    ).toDF("grp", "p", "y")
    val out = RankingMetrics.logLoss(df, "grp", col("p"), col("y"))
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Double]("logloss")).toMap
    assert(out("good") < 0.01)
    assert(out("bad") > 6.0) // -ln(0.001) ≈ 6.9
  }
}
