package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
    (2L, "only three tokens"),
    (3L, ""),                                        // empty → no chunks
    (4L, "   "),                                     // whitespace-only → none
  ).toDF("doc_id", "text")

  test("stride windows cover every token; tail chunk is short, not dropped") {
    val out = Chunking.chunkOverlap(docs, "doc_id", "text", win = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,2,4,6,8 — the last two windows truncate at the tail
    assert(d1.map(_._3).toSeq == Seq(0L, 2L, 4L, 6L, 8L))
    assert(d1.map(_._4).toSeq == Seq(4L, 4L, 4L, 4L, 2L))
    assert(d1.head._5 == "w1 w2 w3 w4")
    assert(d1.last._5 == "w9 w10")
    // overlap: consecutive chunks share win - stride = 2 tokens
    assert(d1(0)._5.split(" ").drop(2).toSeq == d1(1)._5.split(" ").take(2).toSeq)
  }

  test("short doc yields chunks while tokens remain; empty docs yield none") {
    val out = Chunking.chunkOverlap(docs, "doc_id", "text", win = 4, stride = 2)
    val byDoc = out.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc(2L) == 2L) // starts 0 and 2 (3 tokens)
    assert(!byDoc.contains(3L) && !byDoc.contains(4L))
  }

  test("every token position is covered by at least one chunk") {
    val out = Chunking.chunkOverlap(docs, "doc_id", "text", win = 5, stride = 3)
      .filter(col("doc_id") === 1L)
      .select("start_tok", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val covered = out.flatMap { case (s, n) => s until (s + n) }.toSet
    assert(covered == (0L until 10L).toSet)
  }

  test("no shuffles: the chunker is a pure executor-side map") {
    val plan = Chunking.chunkOverlap(docs, "doc_id", "text", 4, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
