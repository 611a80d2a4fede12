package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Value-recoding operators: sequential range bucketing, dictionary decode,
  * and frequency-top-k collapse.
  *
  * Reference: the 18-pass ICD-9 range recode (Hap880_Final_Project.py:131-145),
  * the bucket→name dict decode (py:136-149), and the top-5 ethnicity collapse
  * (py:107). All are pure expression trees — one codegen'd Project, no
  * shuffle, and Catalyst constant-folds/simplifies the `when` chains, so at
  * 100 TB these cost exactly one pass over the column.
  */
object Recodes {

  /** Sequential (first-match-wins) range bucketing: a single chained `when`
    * expression reproducing the reference's loop-of-rewrites semantics in
    * ONE column pass instead of 18 (py:131-145 rewrites the column 18×).
    * Bounds are inclusive on both ends, like pandas `Series.between`.
    */
  def rangeBucket(c: Column, ranges: Seq[(Double, Double, String)], default: Column): Column =
    ranges.foldLeft(Option.empty[Column]) { case (acc, (lo, hi, label)) =>
      val cond = c.between(lo, hi)
      Some(acc.fold(when(cond, label))(_.when(cond, label)))
    }.fold(default)(_.otherwise(default))

  /** Dictionary decode with fall-through: unmatched keys keep their original
    * value, like pandas `Series.replace` (py:149). The map rides the plan as
    * a literal — broadcast-free, codegen-friendly.
    */
  def dictDecode(c: Column, mapping: Map[Int, String]): Column =
    coalesce(element_at(typedLit(mapping), c.cast("int")), c.cast("string"))

  /** Collapse all but the k most frequent values of `colName` into `other`.
    * Ties broken by value ascending so the result is deterministic.
    * The top-k set is collected to the driver (k rows — the reference
    * does the same with nlargest(5), py:107); the recode itself is a
    * broadcast-free `isin` expression.
    */
  def topKOrElse(df: DataFrame, colName: String, k: Int, other: String): DataFrame = {
    val top = df
      .groupBy(colName).count()
      .orderBy(desc("count"), asc(colName))
      .limit(k)
      .collect()
      .map(_.getString(0))
      .toSeq
    df.withColumn(colName, when(col(colName).isin(top: _*), col(colName)).otherwise(lit(other)))
  }

  /** Histogram binning (plt.hist analog, py:66): floor(col/width)*width.
    * The bucket start stays DOUBLE: a long cast would merge adjacent bins
    * for any fractional width (0.2 and 0.7 both → bucket 0 at width 0.5).
    */
  def histBucket(c: Column, width: Double): Column =
    floor(c / width) * width
}
