package graft.text

import graft.SparkSpecBase

class BpeTrainSpec extends SparkSpecBase {
  import spark.implicits._

  test("merges follow pair frequency with lexicographic tiebreaks") {
    // "abab" x3 + "ab" x2: pairs round 1 — (a,b): 3*2+2=8, (b,a): 3
    val docs = Seq((1L, "abab abab abab ab ab")).toDF("doc_id", "text")
    val m = BpeTrain.learnMerges(docs, "text", rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(m(0) == (1, "a", "b", 8L))
    // after merging: "abab" -> |ab|ab|, "ab" -> |ab| ;
    // round 2: (ab,ab) appears once per "abab" word occurrence = 3
    assert(m(1) == (2, "ab", "ab", 3L))
  }

  test("single-pass replace: boundary-sharing repeats merge next round") {
    // "aaa": round-1 pairs (a,a) x2 -> merge (a,a) cnt 2; application is
    // non-overlapping so |a|a|a| -> |aa|a| ; round 2 merges (aa,a)
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val m = BpeTrain.learnMerges(docs, "text", rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(m(0) == (1, "a", "a", 2L))
    assert(m(1) == (2, "aa", "a", 1L))
  }

  test("deterministic across partitionings") {
    val docs = ((1L to 50L).map(i => (i, s"token$i common words common words")))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      BpeTrain.learnMerges(df, "text", rounds = 3)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    assert(run(docs) == run(docs.repartition(7)))
  }

  test("batched with batch=1 equals sequential learnMerges exactly") {
    val docs = Seq((1L, "abab abab abab ab ab cd cd cd aaa aaa")).toDF("doc_id", "text")
    val seq = BpeTrain.learnMerges(docs, "text", rounds = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val bat = BpeTrain.learnMergesBatched(docs, "text", totalMerges = 4, batch = 1)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(bat == seq)
  }

  test("one batched round equals m sequential rounds when picks are disjoint " +
    "and fully consume their words (no promoted pairs)") {
    // two-char words: each merge collapses its word to ONE symbol, so no
    // new pair can outrank a later pick — the exact-equality regime
    val docs = Seq((1L,
      ("ab " * 10) + ("cd " * 9) + ("ef " * 8) + ("gh " * 7))).toDF("doc_id", "text")
    val seq = BpeTrain.learnMerges(docs, "text", rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val bat = BpeTrain.learnMergesBatched(docs, "text", totalMerges = 3, batch = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(bat == seq)
  }

  test("batched greedy skips pairs sharing a symbol with an earlier pick") {
    // top pair (a,b) cnt 10; (b,c) cnt 9 shares b -> skipped; (d,e) cnt 8
    // is the second pick
    val docs = Seq((1L, ("ab " * 10) + ("bc " * 9) + ("de " * 8))).toDF("doc_id", "text")
    val bat = BpeTrain.learnMergesBatched(docs, "text", totalMerges = 2, batch = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(bat == Seq((1, "a", "b", 10L), (2, "d", "e", 8L)))
  }

  test("applyMerges on the training corpus equals the vocab-join encode") {
    // on words SEEN in training, replaying the merges must reproduce each
    // word's final training symbolization — so the two encode paths agree
    val docs = Seq((1L, "abab abab ab cd cd banana band"),
      (2L, "band banana abab cd")).toDF("doc_id", "text")
    val merges = BpeTrain.learnMerges(docs, "text", rounds = 4)
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val viaApply = BpeTrain.applyMerges(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaVocab = BpeTrain.encodedTokenCounts(docs, "doc_id", "text", rounds = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaApply == viaVocab)
  }

  test("applyMerges encodes UNSEEN words by replaying merges in order") {
    val train = Seq((1L, "abab abab abab ab ab")).toDF("doc_id", "text")
    // learned: (a,b) then (ab,ab)
    val merges = BpeTrain.learnMerges(train, "text", rounds = 2)
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val unseen = Seq((9L, "ababab cab")).toDF("doc_id", "text")
    val got = BpeTrain.applyMerges(unseen, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // ababab: |a|b|a|b|a|b| -> (a,b) -> |ab|ab|ab| -> (ab,ab) greedy
    // left-to-right -> |abab|ab| = 2 tokens; cab: |c|a|b| -> |c|ab| = 2
    assert(got == Seq((9L, 4L, 9L)))
  }

  test("batched training exhausts gracefully when no pairs remain") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // only one mergeable pair exists; asking for 5 merges returns 1 row
    val bat = BpeTrain.learnMergesBatched(docs, "text", totalMerges = 5, batch = 2)
      .collect()
    assert(bat.length == 1)
  }
}
