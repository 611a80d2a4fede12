package graft.text

import graft.SparkSpecBase

class BigramLmSpec extends SparkSpecBase {
  import spark.implicits._

  test("docScores computes smoothed bigram log-probs over the corpus model") {
    // corpus: "the cat" ×3 docs, one outlier. unigrams: the=4, cat=3, dog=1
    // vocab=3. bigram (the,cat)=3, (the,dog)=1
    val docs = Seq(
      (1L, "the cat"), (2L, "the cat"), (3L, "the cat"), (4L, "the dog")
    ).toDF("doc_id", "text")
    val out = BigramLm.docScores(docs, "doc_id", "text", minCount = 2L)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_covered"), r.getAs[Double]("avg_lp"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    val lpCat = math.log((3 + 1.0) / (4 + 3)) // P(cat|the) add-one smoothed
    val lpDog = math.log((1 + 1.0) / (4 + 3))
    assert(out(1L)._1 == 1L && out(1L)._2 == 1L)
    assert(math.abs(out(1L)._3 - lpCat) < 1e-5)
    // the outlier bigram is below minCount and scores lower
    assert(out(4L)._2 == 0L)
    assert(math.abs(out(4L)._3 - lpDog) < 1e-5)
    assert(out(4L)._3 < out(1L)._3)
  }

  test("docs with fewer than two tokens have no bigram row") {
    val docs = Seq((1L, "single"), (2L, ""), (3L, "two tokens here")).toDF("doc_id", "text")
    val out = BigramLm.docScores(docs, "doc_id", "text", minCount = 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(3L))
  }

  test("bigrams helper emits adjacent pairs in order") {
    import org.apache.spark.sql.functions._
    val row = Seq("a b c d").toDF("t")
      .select(BigramLm.bigrams(TextOps.tokens(col("t"))).as("bg"))
      .selectExpr("transform(bg, x -> concat(x.w1, '>', x.w2)) AS p")
      .as[Seq[String]].head()
    assert(row == Seq("a>b", "b>c", "c>d"))
  }

  test("kneserNey: hand-computed rationals at D=3/4; seen followers sum to 1") {
    // bigram types: (a,b) c12=2, (a,c) 1, (b,c) 1; ntot=3
    // P(b|a)=21/36, P(c|a)=15/36 (sum 1), P(c|b)=9/12
    val docs = Seq("a b", "a b", "a c", "b c").toDF("text")
    val got = BigramLm.kneserNey(docs, "text", topK = 10)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        ((r.getAs[Long]("c12"), r.getAs[Long]("c1"), r.getAs[Long]("n1_w1"),
          r.getAs[Long]("nc_w2"), r.getAs[Long]("kn_micros")))).toMap
    assert(got(("a", "b")) === ((2L, 3L, 2L, 1L, 583333L)))
    assert(got(("a", "c")) === ((1L, 3L, 2L, 2L, 416667L)))
    assert(got(("b", "c")) === ((1L, 1L, 1L, 2L, 750000L)))
    // interpolated KN is a proper distribution over the seen follower set
    assert(got(("a", "b"))._5 + got(("a", "c"))._5 == 1000000L)
  }

  test("kneserNey: high-frequency single-context words get a small backoff share") {
    // "francisco" appears often but ONLY after "san": its continuation
    // count is 1 context, so P(francisco | unseen-ish context) stays low
    // relative to a word with many contexts. Compare nc_w2 directly.
    val docs = Seq.fill(5)("san francisco").map(s => s + " ok") ++
      Seq("very ok", "quite ok", "so ok")
    val got = BigramLm.kneserNey(docs.toDF("text"), "text", topK = 20)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        r.getAs[Long]("nc_w2")).toMap
    // "ok" follows 4 distinct contexts, "francisco" only 1
    assert(got(("san", "francisco")) == 1L)
    assert(got(("francisco", "ok")) == 4L)
  }

  test("docScores v_size: no single-task window; the unigram exchange is reused") {
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val out = BigramLm.docScores(docs, "doc_id", "text", 1L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in docScores plan:\n$plan")
    assert(plan.contains("ReusedExchange"), s"no exchange reuse in docScores plan:\n$plan")
  }

  test("kneserNey: no single-task window; marginals read the pinned type table") {
    val docs = Seq("a b", "a c", "b c").toDF("text")
    val out = BigramLm.kneserNey(docs, "text", topK = 5)
    val plan = out.queryExecution.analyzed.toString
    assert(!plan.contains("Window"), s"unexpected window in kneserNey plan:\n$plan")
    // the returned frame is the cached topK readout; the corpus-scanning
    // type table was pinned during the build and released before return
    assert(out.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "kneserNey result should be the materialized topK cache")
  }
}
