package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType, TimestampType}

/** Schema-predicate projection and data-quality counts.
  *
  * Reference P9: `select_dtypes(include=numerics)` keeps the numeric
  * columns (Hap880_Final_Project.py:411-412) — here a driver-side schema
  * filter, zero data movement. Reference E2: per-column null counts
  * (`isnull().sum()`, py:31-32) — ONE aggregation pass for all columns.
  */
object SchemaOps {

  /** Keep only columns whose type is numeric (P9). */
  def selectNumeric(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.filter(_.dataType.isInstanceOf[NumericType]).map(_.name)
    df.select(cols.map(col).toSeq: _*)
  }

  def selectByType(df: DataFrame, pred: org.apache.spark.sql.types.DataType => Boolean): DataFrame =
    df.select(df.schema.fields.filter(f => pred(f.dataType)).map(f => col(f.name)).toSeq: _*)

  /** Per-column null counts as a single one-row aggregation (E2). */
  def nullCounts(df: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as("total_rows") +:
      df.columns.toSeq.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Fraction of rows where `c` contains `needle` (reference E14). */
  def containsFraction(df: DataFrame, c: Column, needle: String): Column =
    avg(when(c.contains(needle), 1.0).otherwise(0.0))
}
