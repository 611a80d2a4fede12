package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable interval-overlap join for when NEITHER side fits a broadcast
  * (the j11 range join broadcasts a dim-sized bound set; this is the
  * fact × fact case). Both sides explode onto a fixed time grid and meet
  * in an EQUI-join on the grid cell — Spark shuffles both sides by cell,
  * so cost is (rows × cells-per-interval) through one hash join, never a
  * broadcast-nested-loop over the cross product.
  *
  * Duplicate suppression is arithmetic, not a distinct: a pair of
  * overlapping intervals co-occupies every cell their spans share, but
  * only the cell containing max(a_st, b_st) — the start of the overlap —
  * reports it. That one-cell-owns-the-pair rule removes the post-join
  * DISTINCT (a full extra shuffle of the result) entirely.
  *
  * `bucketWidth` tunes cells-per-interval ≈ span/width + 1: pick it near
  * the typical interval length so most intervals land in 1–2 cells.
  * Bounds must be non-negative (epoch seconds): integer DIV truncates
  * toward zero, which equals floor only for non-negative operands.
  */
object IntervalJoin {

  /** Overlap pairs (closed intervals, st ≤ en on both sides): one output
    * row per (a, b) with a_st ≤ b_en AND b_st ≤ a_en. Output columns
    * (a_id, b_id) — each pair exactly once.
    */
  def overlapPairs(
      a: DataFrame, b: DataFrame,
      idA: String, stA: String, enA: String,
      idB: String, stB: String, enB: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "overlapPairs needs a positive bucketWidth")
    val ax = a.select(col(idA).as("a_id"), col(stA).cast("long").as("a_st"),
        col(enA).cast("long").as("a_en"))
      .withColumn("bkt",
        explode(sequence(expr(s"a_st DIV $bucketWidth"), expr(s"a_en DIV $bucketWidth"))))
    val bx = b.select(col(idB).as("b_id"), col(stB).cast("long").as("b_st"),
        col(enB).cast("long").as("b_en"))
      .withColumn("bkt",
        explode(sequence(expr(s"b_st DIV $bucketWidth"), expr(s"b_en DIV $bucketWidth"))))
    ax.join(bx, Seq("bkt"))
      .filter(col("a_st") <= col("b_en") && col("b_st") <= col("a_en"))
      // the overlap's first cell is its unique reporter
      .filter(col("bkt") === expr(s"greatest(a_st, b_st) DIV $bucketWidth"))
      .select("a_id", "b_id")
  }

  /** DuckDB mirror of [[overlapPairs]] — the grid is a perf strategy, so
    * the oracle joins on the overlap predicate directly.
    */
  def overlapPairsOracleSql(aSql: String, bSql: String): String =
    s"""WITH a AS ($aSql), b AS ($bSql)
       |SELECT a.id AS a_id, b.id AS b_id
       |FROM a JOIN b ON a.st <= b.en AND b.st <= a.en""".stripMargin
}
