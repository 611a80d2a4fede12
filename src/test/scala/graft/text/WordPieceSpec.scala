package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class WordPieceSpec extends SparkSpecBase {
  import spark.implicits._

  test("encode: pieces reassemble the word; continuations carry ##") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val segs = WordPiece.encode(docs, "text",
      maxPieceLen = 4, minFreq = 3, maxWordLen = 12).collect()
    assert(segs.nonEmpty)
    segs.foreach { r =>
      val word = r.getAs[String]("word")
      val seg = r.getAs[String]("seg")
      if (seg != "[UNK]") {
        val pieces = seg.split('|')
        assert(!pieces.head.startsWith("##"), s"initial piece in $seg")
        assert(pieces.tail.forall(_.startsWith("##")), s"bare continuation in $seg")
        assert(pieces.map(_.stripPrefix("##")).mkString === word, s"$seg != $word")
        assert(pieces.length === r.getAs[Int]("n_pieces"))
      } else assert(r.getAs[Int]("n_pieces") === 1)
    }
  }

  test("greedy takes the LONGEST match even when a shorter split is likelier") {
    // same engineered corpus as the unigram spec's Viterbi test: 'abc'
    // is in the vocab but rare; greedy longest-match on "abcd" must take
    // abc|##d where the unigram Viterbi takes ab|cd
    val docs = (Seq.fill(50)("ab cd") ++ Seq.fill(3)("abc") :+ "abcd").toDF("text")
    val segs = WordPiece.encode(docs, "text",
      maxPieceLen = 4, minFreq = 3, maxWordLen = 12)
      .collect().map(r => r.getAs[String]("word") -> r.getAs[String]("seg")).toMap
    // 'abcd' itself has cnt 1 < minFreq, so the longest surviving initial
    // piece is the rare 'abc' (cnt 4) — greedy takes it; Viterbi wouldn't
    assert(segs("abcd") === "abc|##d")
    assert(segs("ab") === "ab")
  }

  test("training chars always encodable: single-char cores bypass minFreq") {
    val docs = Seq("xyzzy").toDF("text")
    val v = WordPiece.vocab(docs, "text", maxPieceLen = 4, minFreq = 1000)
      .select("piece").as[String].collect().toSet
    assert(Set("x", "##y", "##z").subsetOf(v))
    assert(v.forall(p => p.stripPrefix("##").length == 1))
    // so the training word itself encodes without UNK
    val seg = WordPiece.encode(docs, "text", maxPieceLen = 4, minFreq = 1000,
      maxWordLen = 12).collect().map(r =>
      r.getAs[String]("word") -> r.getAs[String]("seg")).toMap
    assert(seg("xyzzy") === "x|##y|##z|##z|##y")
  }

  test("unseen characters and over-long words map to [UNK]") {
    val train = Seq("abba abba abba").toDF("text")
    val target = Seq("abba qab abbaabbaabbaabba").toDF("text")
    val out = WordPiece.encodeApply(train, "text", target, "text",
      maxPieceLen = 4, minFreq = 3, maxWordLen = 12)
      .collect().map(r => (r.getAs[String]("word"),
        r.getAs[String]("seg"), r.getAs[Int]("n_pieces"))).toList
    val bySeg = out.map(t => t._1 -> t._2).toMap
    assert(bySeg("qab") === "[UNK]")                  // 'q' never trained
    assert(bySeg("abbaabbaabbaabba") === "[UNK]")     // 16 chars > maxWordLen
    assert(bySeg("abba") === "abba")                  // whole trained piece
    out.filter(_._2 == "[UNK]").foreach(t => assert(t._3 === 1))
  }

  test("positional vocab: initial and continuation counts are separate") {
    // 'a' appears word-initially in every word; 'b' only as continuation
    val docs = Seq("ab ab ab ab").toDF("text")
    val v = WordPiece.vocab(docs, "text", maxPieceLen = 2, minFreq = 3)
      .select("piece", "cnt").as[(String, Long)].collect().toMap
    assert(v("a") === 4L)
    assert(v("##b") === 4L)
    assert(!v.contains("b"))    // 'b' never word-initial
    assert(!v.contains("##a"))  // 'a' never a continuation
    assert(v("ab") === 4L)      // full word as initial piece, cnt ≥ minFreq
  }
}
