package graft.text

import graft.SparkSpecBase

class QualityCascadeSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)],
                  minTok: Int = 3, maxTok: Int = 100,
                  minLen: Double = 2.0, maxLen: Double = 8.0,
                  minTtr: Double = 0.5): Map[String, Long] =
    QualityCascade.cascade(rows.toDF("doc_id", "text"), "text",
        minTok, maxTok, minLen, maxLen, minTtr)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("each document is charged to the FIRST rule it fails") {
    val m = run(Seq(
      (1L, "one two"),                       // 2 tokens → n_tokens
      (2L, "a b c d"),                       // mean len 1 → mean_token_len
      (3L, "dup dup dup dup dup dup"),       // ttr 1/6 → type_token_ratio
      (4L, "alpha beta gamma delta"),        // passes all
      // fails BOTH length and ttr → charged to n_tokens (first rule)
      (5L, "x x " + ("y " * 150).trim)
    ))
    assert(m == Map("n_tokens" -> 2L, "mean_token_len" -> 1L,
      "type_token_ratio" -> 1L, "kept" -> 1L))
  }

  test("empty text fails the token-count rule, not a divide-by-zero") {
    val m = run(Seq((1L, ""), (2L, "   "), (3L, "солнце")))  // non-alpha → 0 tokens
    assert(m == Map("n_tokens" -> 3L))
  }

  test("NULL text is charged to n_tokens, never silently kept") {
    val m = run(Seq((1L, null.asInstanceOf[String]), (2L, "alpha beta gamma delta")))
    assert(m == Map("n_tokens" -> 1L, "kept" -> 1L))
  }

  test("boundary values are inclusive (BETWEEN semantics)") {
    // exactly minTok tokens, mean len exactly maxLen → kept
    val m = run(Seq((1L, "abcd efgh ijkl")), minTok = 3, maxTok = 3,
      minLen = 4.0, maxLen = 4.0, minTtr = 0.5)
    assert(m == Map("kept" -> 1L))
  }
}
