package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions.col

class CorpusStatsSpec extends SparkSpecBase {
  import spark.implicits._

  test("zipfSlope recovers ≈ −1 on an exactly Zipfian corpus") {
    // term_r appears floor(1200/r) times, r = 1..30: freq ∝ 1/rank
    val docs = (1 to 30).flatMap { r =>
      val word = s"w${('a' + r / 26).toChar}${('a' + r % 26).toChar}"
      Seq.fill(1200 / r)(word)
    }
    val df = Seq(docs.mkString(" ")).toDF("text")
    val row = CorpusStats.zipfSlope(df, col("text"), topN = 30).collect().head
    assert(row.getAs[Long]("n_terms") == 30L)
    val slope = row.getAs[Double]("slope")
    // floor() and the integer-frequency grid bend the fit slightly
    assert(math.abs(slope + 1.0) < 0.05, s"slope=$slope")
  }

  test("zipfSlope is ~0 on a flat (non-Zipfian) corpus and caps at topN") {
    val docs = (1 to 50).flatMap(r =>
      Seq.fill(100)(s"t${('a' + r / 26).toChar}${('a' + r % 26).toChar}"))
    val df = Seq(docs.mkString(" ")).toDF("text")
    val row = CorpusStats.zipfSlope(df, col("text"), topN = 20).collect().head
    assert(row.getAs[Long]("n_terms") == 20L)
    assert(math.abs(row.getAs[Double]("slope")) < 1e-6)
  }

  test("zipfSlope is invariant to document partitioning") {
    val docs = (1 to 40).map(i => s"alpha beta beta gamma gamma gamma doc$i")
    val one = CorpusStats.zipfSlope(docs.toDF("text").coalesce(1), col("text"), 10)
      .collect().head.getAs[Double]("slope")
    val many = CorpusStats.zipfSlope(docs.toDF("text").repartition(7), col("text"), 10)
      .collect().head.getAs[Double]("slope")
    assert(one == many)
  }
}
