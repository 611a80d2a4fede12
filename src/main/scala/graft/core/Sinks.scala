package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sinks (reference S6: `df.to_csv`, Hap880_Final_Project.py:265).
  *
  * Distributed-first: writers emit one file per partition; `singleFile`
  * coalesces to 1 only for small exports/tests (a 100 TB result is never
  * a single CSV). Parquet is the default interchange format — columnar,
  * compressed, schema-carrying.
  */
object Sinks {

  def csv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }

  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
