package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators: salted two-phase aggregation.
  *
  * When a grouping key is heavily skewed (one key holding a large share
  * of rows), a plain hash aggregation sends the hot key's entire volume
  * to one reducer. Salting splits each key into `saltBuckets` synthetic
  * sub-keys for a first partial aggregation, then re-aggregates the small
  * per-(key,salt) partials — the hot key's work spreads over
  * `saltBuckets` reducers. Results are EXACTLY equal to the unsalted
  * aggregation (the DuckDB oracle for the salted query is the plain
  * GROUP BY), which is the point: same answer, bounded reducer load.
  *
  * AQE's skew-join handling covers joins; this covers aggregations with
  * algebraic (re-aggregatable) functions.
  */
object SkewOps {

  /** count per key, salted. */
  def saltedCount(df: DataFrame, keyCol: String, saltBuckets: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum("_partial").as("cnt"))

  /** sum/count/min/max per key, salted — the general algebraic pattern. */
  def saltedAgg(df: DataFrame, keyCol: String, valueCol: Column, saltBuckets: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
      .withColumn("_v", valueCol)
      .groupBy(col(keyCol), col("_salt"))
      .agg(
        count(lit(1)).as("_n"),
        sum("_v").as("_sum"),
        min("_v").as("_min"),
        max("_v").as("_max"))
      .groupBy(col(keyCol))
      .agg(
        sum("_n").as("cnt"),
        sum("_sum").as("sum_v"),
        min("_min").as("min_v"),
        max("_max").as("max_v"))
}
