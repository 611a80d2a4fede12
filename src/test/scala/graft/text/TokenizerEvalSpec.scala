package graft.text

import graft.SparkSpecBase

class TokenizerEvalSpec extends SparkSpecBase {
  import spark.implicits._

  test("bake-off: three rows, sane coverage ordering, fertility >= 1 piece/word") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val rows = TokenizerEval.fertility(docs, "text",
      bpeRounds = 5, maxPieceLen = 4, minFreq = 3, maxWordLen = 12)
      .collect().map(r => r.getAs[String]("tokenizer") ->
        (r.getAs[Long]("covered_words"), r.getAs[Long]("covered_occ"),
          r.getAs[Long]("fertility_micro"))).toMap
    assert(rows.keySet === Set("bpe", "unigram", "wordpiece"))
    // BPE covers every training word by construction; the subword pair
    // cover only words <= maxWordLen (training chars always segmentable)
    assert(rows("bpe")._1 >= rows("unigram")._1)
    assert(rows("unigram")._1 === rows("wordpiece")._1,
      "both subword tokenizers cover exactly the <=maxWordLen training words")
    rows.values.foreach { case (w, occ, f) =>
      assert(w > 0 && occ >= w)
      assert(f >= 1000000L, s"fertility below one piece per word: $f")
    }
    // 5 BPE merges leave most words near character-level: fertility must
    // exceed the length-4-piece subword tokenizers'
    assert(rows("bpe")._3 > rows("unigram")._3)
  }
}
