package graft.ml

import graft.SparkSpecBase

class NegativeSamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private val corpus = (1L to 40L).map(i => (i, (i % 4).toInt)).toDF("id", "label")

  test("negativePairs: never self, never same-label, at most k per anchor") {
    val labels = corpus.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = NegativeSampling.negativePairs(corpus, corpus, "id", "label", k = 3, buckets = 4)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val a = r.getAs[Long]("anchor_id"); val n = r.getAs[Long]("neg_id")
      assert(a != n)
      assert(labels(a) != labels(n))
    }
    val perAnchor = out.groupBy(_.getAs[Long]("anchor_id")).view.mapValues(_.length)
    assert(perAnchor.values.forall(_ <= 3))
    // each (anchor, j) appears at most once
    val keys = out.map(r => (r.getAs[Long]("anchor_id"), r.getAs[Int]("j")))
    assert(keys.distinct.length == keys.length)
  }

  test("negativePairs is deterministic across repartitionings") {
    def run(parts: Int) =
      NegativeSampling.negativePairs(
        corpus.repartition(parts), corpus.repartition(parts + 1), "id", "label", k = 2, buckets = 4)
        .collect()
        .map(r => (r.getAs[Long]("anchor_id"), r.getAs[Int]("j"), r.getAs[Long]("neg_id")))
        .toSet
    assert(run(1) == run(7))
  }

  test("negativePairs yields nothing when every candidate shares the label") {
    val oneLabel = (1L to 10L).map(i => (i, 0)).toDF("id", "label")
    assert(NegativeSampling.negativePairs(oneLabel, oneLabel, "id", "label", 2, 4)
      .collect().isEmpty)
  }
}
