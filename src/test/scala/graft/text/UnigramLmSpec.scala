package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class UnigramLmSpec extends SparkSpecBase {
  import spark.implicits._

  test("segment: pieces reassemble the word exactly and n_pieces matches") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val segs = UnigramLm.segment(docs, "text",
      maxPieceLen = 4, minFreq = 3, maxWordLen = 12).collect()
    assert(segs.nonEmpty)
    segs.foreach { r =>
      val word = r.getAs[String]("word")
      val seg = r.getAs[String]("seg")
      assert(seg.replace("|", "") === word, s"seg $seg != $word")
      assert(seg.split('|').length === r.getAs[Int]("n_pieces"))
    }
  }

  test("segment score equals the sum of its pieces' vocab scores") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val v = UnigramLm.vocab(docs, "text", maxPieceLen = 4, minFreq = 3)
      .select("piece", "vscore").as[(String, Long)].collect().toMap
    UnigramLm.segment(docs, "text", maxPieceLen = 4, minFreq = 3, maxWordLen = 12)
      .collect().foreach { r =>
        val expected = r.getAs[String]("seg").split('|').map(v).sum
        assert(r.getAs[Long]("score_micro") === expected)
      }
  }

  test("Viterbi beats greedy longest-match when a long piece is rare") {
    // corpus engineered so 'abc' IS in the vocab (cnt 4 ≥ minFreq) but
    // rare, while 'ab' and 'cd' are very frequent: greedy longest-match
    // on "abcd" takes abc|d; the max-likelihood DP must take ab|cd
    // (ln 55 + ln 51 ≫ ln 4 + ln 5 in any normalization)
    val docs = (Seq.fill(50)("ab cd") ++ Seq.fill(3)("abc") :+ "abcd").toDF("text")
    val vocab = UnigramLm.vocab(docs, "text", maxPieceLen = 4, minFreq = 3)
      .select("piece").as[String].collect().toSet
    assert(vocab.contains("abc")) // greedy WOULD have matched it first
    val segs = UnigramLm.segment(docs, "text",
      maxPieceLen = 4, minFreq = 3, maxWordLen = 12)
      .collect().map(r => r.getAs[String]("word") -> r.getAs[String]("seg")).toMap
    assert(segs("abcd") === "ab|cd")
    assert(segs("ab") === "ab")
  }

  test("hard-EM round: corpus likelihood never decreases; EM prunes, never invents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val s1 = UnigramLm.segment(docs, "text",
      maxPieceLen = 4, minFreq = 3, maxWordLen = 12).collect()
    val s2 = UnigramLm.emSegment(docs, "text",
      maxPieceLen = 4, minFreq = 3, maxWordLen = 12).collect()
    assert(s2.nonEmpty && s2.length === s1.length,
      "every round-1 word stays coverable in round 2")
    s2.foreach { r =>
      assert(r.getAs[String]("seg").replace("|", "") === r.getAs[String]("word"))
    }
    // Viterbi-EM monotonicity: L(seg2 | m1) >= L(seg1 | m1) >= L(seg1 | m0)
    // (m1 is the MLE of seg1's hard counts); micro-rounding gives each
    // word's score at most 1 micro-nat of slack
    def total(rows: Array[org.apache.spark.sql.Row]): Long =
      rows.map(r => r.getAs[Long]("wcnt") * r.getAs[Long]("score_micro")).sum
    assert(total(s2) >= total(s1) - s1.map(_.getAs[Long]("wcnt")).sum,
      s"EM decreased corpus likelihood: ${total(s1)} -> ${total(s2)}")
    // EM prunes the model: round-2 pieces all appeared in round-1 segs
    val used1 = s1.flatMap(_.getAs[String]("seg").split('|')).toSet
    val used2 = s2.flatMap(_.getAs[String]("seg").split('|')).toSet
    assert(used2.subsetOf(used1))
  }

  test("vocab total: no single-task window; the piece exchange is reused, not re-scanned") {
    val docs = Seq("ab ab cd", "ab cd cd").toDF("text")
    val v = UnigramLm.vocab(docs, "text", maxPieceLen = 3, minFreq = 2)
    v.collect()
    val plan = v.queryExecution.executedPlan.toString
    // the grand total must NOT ride a Window over the vocab frame...
    assert(!plan.contains("Window"), s"unexpected window in vocab plan:\n$plan")
    // ...and its global-agg branch must reuse the piece exchange (one
    // corpus explode+agg feeding both the scores and the total)
    assert(plan.contains("ReusedExchange"), s"no exchange reuse in vocab plan:\n$plan")
  }

  test("every single char survives the vocab regardless of minFreq") {
    val docs = Seq("xyzzy").toDF("text")
    val v = UnigramLm.vocab(docs, "text", maxPieceLen = 4, minFreq = 1000)
      .select("piece").as[String].collect().toSet
    assert(Set("x", "y", "z").subsetOf(v))
    // and nothing longer survives the frequency floor
    assert(v.forall(_.length == 1))
  }
}
