package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 2-D Pareto frontier (skyline): the rows not dominated by
  * any other row when MAXIMIZING two integer measures (x, y) — "best
  * customers by (total spend, order count)", "docs no other doc beats on
  * both quality and length". Row a dominates b iff x_a ≥ x_b ∧ y_a ≥ y_b
  * with at least one strict; duplicates of a frontier point all survive
  * (neither dominates the other).
  *
  * The naive encodings are a self θ-join (O(n²) — dead at scale) or a
  * global sort + running max (a SinglePartition window — one reducer owns
  * the whole table). This is the scalable decomposition:
  *
  *   1. bucket rows by fixed-width ranges of x (`floor(x / bucketWidth)`)
  *      — a map-side column, no shuffle;
  *   2. WITHIN a bucket, dominance needs only that bucket's rows: one
  *      hash exchange on the bucket id, then `max(y)` over the RANGE
  *      frame of strictly-greater x (desc order, `1 PRECEDING` bound)
  *      gives the local frontier test in one windowed pass;
  *   3. ACROSS buckets, every row of a higher bucket has strictly
  *      greater x than every row of a lower one, so cross-bucket
  *      dominance collapses to the per-bucket max(y) chain: a B-row
  *      aggregate, windowed over B rows (B = value-range/bucketWidth,
  *      driver-scale), broadcast back onto the buckets.
  *
  * One hash shuffle of the data + one broadcast of a B-row table; no
  * pairwise join, no single-reducer pass over data rows. Survives 100 TB
  * with per-bucket parallelism; `bucketWidth` only tunes balance, never
  * the answer.
  *
  * `x` must be an exact integral column (cast money to cents first —
  * range frames need a numeric ordering key and dominance needs exact
  * comparisons). Output keeps `keep` plus the x/y columns, frontier rows
  * only.
  */
object Skyline {

  def frontier2D(
      df: DataFrame, xCol: String, yCol: String,
      keep: Seq[String], bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val working = Seq("_sky_b", "_sky_m1", "_sky_m2", "_sky_hi")
    require(!df.columns.exists(working.contains),
      s"input columns collide with skyline working columns ${working.mkString(",")}")
    val base = df.select((keep.map(col) :+ col(xCol) :+ col(yCol)): _*)
      .withColumn("_sky_b", floor(col(xCol) / lit(bucketWidth)).cast("long"))

    // B-row chain: for bucket b, the max y of all STRICTLY higher buckets.
    // The unpartitioned window runs over ≤ B rows (one per non-empty
    // bucket), not data rows — driver-scale by construction.
    val chain = base.groupBy("_sky_b").agg(max(col(yCol)).as("_sky_bymax"))
      .withColumn("_sky_hi", max("_sky_bymax").over(
        Window.orderBy(col("_sky_b").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select("_sky_b", "_sky_hi")

    // local pass: m1 = best y among same-bucket rows with strictly
    // greater x (RANGE … 1 PRECEDING under desc order); m2 = best y at
    // exactly this x (same-x dominance is strict in y)
    val byXDesc = Window.partitionBy("_sky_b").orderBy(col(xCol).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val local = base
      .withColumn("_sky_m1", max(col(yCol)).over(byXDesc))
      .withColumn("_sky_m2", max(col(yCol)).over(
        Window.partitionBy(col("_sky_b"), col(xCol))))

    local.join(broadcast(chain), Seq("_sky_b"))
      .filter(
        (col("_sky_m1").isNull || col(yCol) > col("_sky_m1")) &&
        col(yCol) === col("_sky_m2") &&
        (col("_sky_hi").isNull || col(yCol) > col("_sky_hi")))
      .select((keep.map(col) :+ col(xCol) :+ col(yCol)): _*)
  }

  /** DuckDB mirror: the textbook NOT EXISTS dominance predicate over an
    * aggregate CTE — quadratic, fine at oracle scale, and definitionally
    * the skyline [[frontier2D]] must reproduce.
    */
  def frontier2DOracleSql(aggCte: String, idSql: String, xSql: String, ySql: String): String =
    s"""WITH agg AS ($aggCte)
       |SELECT a.$idSql, a.$xSql, a.$ySql
       |FROM agg a
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM agg b
       |  WHERE b.$xSql >= a.$xSql AND b.$ySql >= a.$ySql
       |    AND (b.$xSql > a.$xSql OR b.$ySql > a.$ySql))""".stripMargin
}
