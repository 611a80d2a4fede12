package graft.ml

import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic hash-bucket negative sampling for contrastive-training
  * pairs: every anchor draws `k` pseudo-random different-label negatives
  * from a corpus with NO RNG state — draw j probes the bucket
  * md5("np#"+anchor+"#"+j) and takes the candidate minimizing
  * md5(anchor+"|"+cand) inside it. The same portable-md5 discipline as
  * the hash-sampling tier (o4/o8), so the drawn pairs are replayable on
  * any engine, any partitioning, any executor count — and exactly
  * mirrorable in the DuckDB oracle.
  *
  * Scale shape: candidates shuffle ONCE into B buckets; each of the
  * |anchors|·k probes joins one bucket (|corpus|/B rows), so the total
  * candidate stream is O(|anchors|·k·|corpus|/B) with no cross join and
  * no driver-side draw loop. B scales with the corpus to hold bucket
  * size constant; the per-(anchor,j) argmin is a partial-aggregable
  * min(struct), not a window sort.
  *
  * A probe whose bucket holds only same-label candidates yields no row —
  * deterministic; with B well below per-label cardinality this is rare,
  * and callers wanting exactly-k re-probe misses under a second salt.
  */
object NegativeSampling {

  def negativePairs(
      anchors: DataFrame, corpus: DataFrame,
      idCol: String, labelCol: String, k: Int, buckets: Int): DataFrame = {
    require(k > 0 && buckets > 0, "negativePairs needs k > 0 and buckets > 0")
    val b = lit(buckets.toLong)
    val cand = corpus.select(
      col(idCol).as("neg_id"), col(labelCol).as("_nl"),
      pmod(TextOps.md5Hash60(concat(lit("nb#"), col(idCol).cast("string"))), b).as("_b"))
    val probes = anchors
      .select(col(idCol).as("anchor_id"), col(labelCol).as("_al"))
      .withColumn("j", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("_b", pmod(TextOps.md5Hash60(concat(
        lit("np#"), col("anchor_id").cast("string"), lit("#"), col("j").cast("string"))), b))
    probes.join(cand, Seq("_b"))
      .filter(col("_nl") =!= col("_al") && col("neg_id") =!= col("anchor_id"))
      .withColumn("_th", TextOps.md5Hash60(concat(
        col("anchor_id").cast("string"), lit("|"), col("neg_id").cast("string"))))
      .groupBy("anchor_id", "j")
      .agg(min(struct(col("_th"), col("neg_id"))).as("_m"))
      .select(col("anchor_id"), col("j"), col("_m.neg_id").as("neg_id"))
  }

  /** DuckDB mirror of [[negativePairs]] — same salts, same k/buckets,
    * generated so the two can't drift. `anchorPredSql` restricts the
    * anchor rows (SQL over the raw table's columns).
    */
  def negativePairsOracleSql(
      table: String, idCol: String, labelCol: String,
      k: Int, buckets: Int, anchorPredSql: String): String = {
    def h60(s: String) = s"CAST(concat('0x', substr(md5($s), 1, 15)) AS BIGINT)"
    s"""WITH cand AS (
       |  SELECT $idCol AS neg_id, $labelCol AS nl,
       |         ${h60(s"concat('nb#', CAST($idCol AS VARCHAR))")} % $buckets AS b
       |  FROM $table
       |), probes AS (
       |  SELECT $idCol AS anchor_id, $labelCol AS al, j,
       |         ${h60(s"concat('np#', CAST($idCol AS VARCHAR), '#', CAST(j AS VARCHAR))")} % $buckets AS b
       |  FROM $table, (SELECT unnest(range(0, $k)) AS j)
       |  WHERE $anchorPredSql
       |), ranked AS (
       |  SELECT p.anchor_id, p.j, c.neg_id,
       |         row_number() OVER (PARTITION BY p.anchor_id, p.j
       |           ORDER BY ${h60("concat(CAST(p.anchor_id AS VARCHAR), '|', CAST(c.neg_id AS VARCHAR))")}, c.neg_id) AS rn
       |  FROM probes p JOIN cand c ON p.b = c.b
       |  WHERE c.nl <> p.al AND c.neg_id <> p.anchor_id
       |)
       |SELECT anchor_id, CAST(j AS INTEGER) AS j, neg_id FROM ranked WHERE rn = 1""".stripMargin
  }
}
