package graft.text

import graft.SparkSpecBase

class Bm25Spec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),        // tf(apple)=2, dl=3
    (2L, "banana cherry"),             // dl=2
    (3L, "apple"),                     // tf(apple)=1, dl=1
    (4L, "durian durian durian durian") // no query terms, dl=4
  ).toDF("doc_id", "text")

  test("bm25 matches the hand-computed Okapi formula") {
    val out = Bm25.scores(docs, "doc_id", "text", Seq("apple"), k1 = 1.2, b = 0.75)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    // N=4, df(apple)=2, avgdl=2.5; idf = ln(1 + (4-2+0.5)/(2+0.5)) = ln(2)
    val idf = math.log(2.0)
    def s(tf: Double, dl: Double): Double = {
      val raw = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2.5))
      math.rint(math.rint(raw * 1e9) / 1e9 * 1e6) / 1e6 // round9 → round6 as the operator does
    }
    assert(out.keySet == Set(1L, 3L)) // docs without any query term score nothing
    assert(math.abs(out(1L) - s(2, 3)) < 2e-6)
    assert(math.abs(out(3L) - s(1, 1)) < 2e-6)
  }

  test("bm25 sums per-term contributions for multi-term queries") {
    val single = Bm25.scores(docs, "doc_id", "text", Seq("banana"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    val multi = Bm25.scores(docs, "doc_id", "text", Seq("apple", "banana"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    assert(multi.keySet == Set(1L, 2L, 3L))
    // doc 2 has only banana — its multi-query score equals the banana-only score
    assert(multi(2L) == single(2L))
    // doc 1 has both terms — its score strictly exceeds either single-term score
    assert(multi(1L) > single(1L))
  }

  test("bm25: rarer terms earn higher idf weight at equal tf and dl") {
    val corpus = Seq(
      (1L, "common rare"), (2L, "common x"), (3L, "common y"), (4L, "common z")
    ).toDF("doc_id", "text")
    val out = Bm25.scores(corpus, "doc_id", "text", Seq("common", "rare"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    val commonOnly = out(2L)
    // doc 1 adds 'rare' (df=1) on top of 'common' (df=4): strictly higher
    assert(out(1L) > commonOnly * 2)
  }
}
