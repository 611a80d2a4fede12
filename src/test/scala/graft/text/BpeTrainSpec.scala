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
}
