package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Deploy-time unigram encode: model from one corpus applied to another. */
class UnigramApplySpec extends SparkSpecBase {
  import spark.implicits._

  test("segmentApply segments covered words and drops uncoverable ones") {
    val train = Seq.fill(5)("abba baab").toDF("text")
    val target = Seq("abba quiz ab").toDF("text")
    val segs = UnigramLm.segmentApply(train, "text", target, "text",
      maxPieceLen = 4, minFreq = 3, maxWordLen = 12)
      .collect().map(r => r.getAs[String]("word") -> r.getAs[String]("seg")).toMap
    // 'quiz' has chars the training corpus never produced → dropped
    assert(!segs.contains("quiz"))
    assert(segs.contains("abba") && segs.contains("ab"))
    segs.foreach { case (w, s) => assert(s.replace("|", "") === w) }
  }

  test("segmentApply on the training corpus equals segment") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = UnigramLm.segmentApply(docs, "text", docs, "text",
      maxPieceLen = 4, minFreq = 3, maxWordLen = 12)
    val b = UnigramLm.segment(docs, "text",
      maxPieceLen = 4, minFreq = 3, maxWordLen = 12)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
