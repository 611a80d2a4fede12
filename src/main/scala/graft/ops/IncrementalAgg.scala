package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a grouped (count, sum…)
  * snapshot current under a CDC delta WITHOUT rescanning the base table.
  * All maintained aggregates are self-decomposable (count, decimal sum —
  * and anything derivable from them: mean, totals), so
  *
  *   maintain(aggregate(base), delta) == aggregate(base ⊖ deletes ⊕ inserts)
  *
  * holds EXACTLY — that equality is this operator's oracle contract.
  *
  * Scale shape: the base table appears only through its (already
  * aggregated) snapshot — group-cardinality rows, not data rows. The
  * delta aggregates map-side (inserts +1, deletes −1, both waves in one
  * pass), then a single outer join of two group-sized frames merges
  * components; groups whose live count reaches 0 drop out. Refreshing a
  * 100 TB table's rollup after a 1 GB delta costs |delta| + |groups|,
  * never a rescan.
  */
object IncrementalAgg {

  /** Aggregate `df` into the maintained snapshot shape:
    * (group…, cnt, sum_<valueCol>). */
  def snapshot(df: DataFrame, group: Seq[String], valueCol: String): DataFrame =
    df.groupBy(group.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sum(col(valueCol).cast("decimal(18,2)")).as(s"sum_$valueCol"))

  /** Apply a CDC delta to a snapshot. `delta` carries the base schema
    * plus `opCol` ∈ {"I", "D"} (insert / delete of a full row). Deleting
    * a row that is not in the base, like any CDC feed mismatch, silently
    * produces the merged arithmetic — upstream integrity is
    * [[Expectations]]' job, not the maintainer's.
    */
  def maintain(snap: DataFrame, delta: DataFrame, group: Seq[String],
               valueCol: String, opCol: String = "op"): DataFrame = {
    val sumCol = s"sum_$valueCol"
    val sign = when(col(opCol) === "D", lit(-1L)).otherwise(lit(1L))
    val d = delta.groupBy(group.map(col): _*).agg(
      sum(sign).as("_dcnt"),
      sum((col(valueCol).cast("decimal(18,2)") *
        sign.cast("decimal(18,2)")).cast("decimal(18,2)")).as("_dsum"))
    snap.join(d, group, "full_outer")
      .select(group.map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("_dcnt"), lit(0L))).as("cnt"),
        (coalesce(col(sumCol), lit(0).cast("decimal(18,2)")) +
          coalesce(col("_dsum"), lit(0).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as(sumCol)): _*)
      .filter(col("cnt") > 0)
  }
}
