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

  test("batched training exhausts gracefully when no pairs remain") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // only one mergeable pair exists; asking for 5 merges returns 1 row
    val bat = BpeTrain.learnMergesBatched(docs, "text", totalMerges = 5, batch = 2)
      .collect()
    assert(bat.length == 1)
  }
}
