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

  /** Parquet write with a per-file row cap: one oversized task's output
    * splits into ceil(rows/max) files instead of one multi-GB file. The
    * other half of output hygiene at 100 TB — readers parallelize per
    * file/rowgroup, and a handful of giant files caps downstream
    * parallelism the same way millions of tiny ones cap the namenode.
    */
  def parquetSized(df: DataFrame, path: String, maxRecordsPerFile: Long): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Compaction: rewrite a many-small-files dataset into `numFiles`
    * outputs. The small-files problem is the classic failure mode of
    * incremental pipelines (every micro-batch/run appends a few files
    * until listing + open overhead dominates scans); periodic compaction
    * is the fix. Round-robin repartition gives evenly-sized outputs.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              numFiles: Int, outPath: String): Unit =
    spark.read.parquet(path).repartition(numFiles)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
}
