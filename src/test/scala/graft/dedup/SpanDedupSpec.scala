package graft.dedup

import graft.SparkSpecBase

class SpanDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val L = 3

  private def run(docs: Seq[(Long, String)]) =
    SpanDedup.dupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", L = L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_dup_windows"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("max_span_tokens"), r.getAs[Long]("dup_tokens"))).toMap

  test("a shared L-token block is found in both docs as one span") {
    val shared = "alpha beta gamma"
    val got = run(Seq(
      (1L, s"one two $shared three"),
      (2L, s"$shared four five six")))
    // each doc has exactly one duplicated window of length 3
    assert(got(1L) === ((1L, 1L, 3L, 3L)))
    assert(got(2L) === ((1L, 1L, 3L, 3L)))
  }

  test("overlapping duplicated windows merge into one maximal span") {
    // a 5-token shared block yields 3 overlapping windows -> ONE span of 5
    val blk = "a b c d e"
    val got = run(Seq((1L, s"x y $blk z"), (2L, s"p q r $blk")))
    assert(got(1L) === ((3L, 1L, 5L, 5L)))
    assert(got(2L) === ((3L, 1L, 5L, 5L)))
  }

  test("far-apart duplicated blocks stay separate spans") {
    val got = run(Seq(
      (1L, "a b c one two three four five six seven d e f"),
      (2L, "a b c unrelated words here d e f")))
    // both docs: two 3-token spans (abc, def), 6 dup tokens total
    assert(got(1L) === ((2L, 2L, 3L, 6L)))
    assert(got(2L) === ((2L, 2L, 3L, 6L)))
  }

  test("intra-document repetition is duplication too (suffix-array semantics)") {
    val got = run(Seq((7L, "x y z filler words x y z")))
    assert(got(7L) === ((2L, 2L, 3L, 6L)))
  }

  test("unique docs and sub-L docs produce no rows") {
    val got = run(Seq(
      (1L, "entirely unique words in this document"),
      (2L, "so is") /* < L tokens */))
    assert(got.isEmpty)
  }

  test("touching windows (gap exactly L) still merge; gap L+1 splits") {
    // doc1/doc2 share windows starting at positions s and s+L (touching:
    // spans [s, s+L-1] and [s+L, s+2L-1] are adjacent) -> one 2L span
    val blk = "a b c d e f" // 6 = 2L tokens, windows at 1..4 all duplicated
    val got = run(Seq((1L, blk), (2L, s"pad $blk")))
    assert(got(1L) === ((4L, 1L, 6L, 6L)))
  }
}
