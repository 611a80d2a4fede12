package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Smoothed target (mean) encoding — the high-cardinality-categorical
  * feature transform the reference approximates with one-hot matrices
  * (reference: Hap880_Final_Project.py:360-376, pd.get_dummies). One-hot
  * explodes at 100 TB (a million-category column becomes a million
  * columns); target encoding keeps one double per category and is the
  * standard large-scale replacement.
  *
  * All arithmetic is rational (+ − × ÷ over exact integer counts), so the
  * encodings are bit-identical across engines — no rounding needed for
  * oracle comparison.
  */
object TargetEncoding {

  /** Per-category smoothed mean: `(pos + α·prior) / (cnt + α)` where
    * `prior` is the global positive rate. α interpolates between the
    * category's own rate (big categories) and the prior (rare ones).
    *
    * Scale shape: one hash-aggregation to the category table (map-side
    * partial combine), one 1-row broadcast for the prior. The category
    * table is output-sized, never the data.
    */
  def encode(df: DataFrame, cat: String, label: Column, alpha: Double): DataFrame = {
    val perCat = df
      .groupBy(col(cat))
      .agg(
        count(lit(1)).as("cnt"),
        sum(label.cast("long")).as("pos"))
    // the prior rides a global window over the CATEGORY table (not the
    // data): one single-partition pass over |categories| thin rows. The
    // alternative — crossJoin(broadcast(perCat.agg(...))) — physically
    // re-evaluates the perCat subtree and re-scans the fact table.
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    perCat
      .withColumn("prior",
        sum("pos").over(wAll).cast("double") / sum("cnt").over(wAll))
      .select(
        col(cat), col("cnt"), col("pos"), col("prior"),
        ((col("pos") + lit(alpha) * col("prior")) / (col("cnt") + lit(alpha)))
          .as("encoding"))
  }

  /** Leave-one-out variant: each ROW is encoded from its category's
    * statistics minus its own label — `(pos − y + α·prior) / (cnt − 1 + α)`
    * — the standard leakage guard when the encoding feeds a model trained
    * on the same rows.
    *
    * Scale shape: the category table from [[encode]] is broadcast back
    * onto the data (categories ≪ rows by definition of the transform), so
    * the data-sized side never shuffles.
    */
  def looEncode(df: DataFrame, cat: String, label: Column, alpha: Double): DataFrame = {
    val y = label.cast("long")
    df
      .withColumn("_y", y)
      .join(broadcast(encode(df, cat, label, alpha).drop("encoding")), Seq(cat))
      .withColumn(
        "loo_encoding",
        (col("pos") - col("_y") + lit(alpha) * col("prior")) /
          (col("cnt") - lit(1) + lit(alpha)))
      .drop("_y")
  }
}
