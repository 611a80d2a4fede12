package graft.ml

import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The hashing trick: project arbitrary categorical features into a fixed
  * k-dimensional space via `bucket = hash("col=value") mod k`, with a
  * second hash bit supplying the ± sign that keeps collisions unbiased
  * (Weinberger et al., "Feature Hashing for Large Scale Multitask
  * Learning"). Where the reference one-hots a bounded vocabulary
  * (Hap880_Final_Project.py:360-376), hashing needs NO vocabulary pass at
  * all — the single property that matters at 100 TB, where the category
  * set is unbounded and drifting.
  *
  * Built on the 60-bit md5 portable hash ([[TextOps.md5Hash60]]) so the
  * buckets are engine-reproducible (DuckDB mirror:
  * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`); everything downstream
  * is integer arithmetic — exactly oracle-able.
  */
object FeatureHashing {

  /** Explode `cats` columns of each row into hashed (bucket, ±1) entries
    * and sum per (id, bucket) — the sparse hashed feature vector in COO
    * form. Null feature values contribute nothing.
    *
    * Scale shape: narrow projection + explode (no shuffle), then one
    * hash-aggregation keyed (id, bucket) with map-side combine. Output is
    * at most |rows| × |cats| entries, pre-shrunk by in-row collisions.
    */
  def hashedFeatures(df: DataFrame, id: String, cats: Seq[String], buckets: Int): DataFrame = {
    require(cats.nonEmpty, "need at least one feature column")
    require(buckets > 0, "bucket count must be positive")
    val entries = cats.map { c =>
      struct(lit(c).as("f"), col(c).cast("string").as("v"))
    }
    val h = TextOps.md5Hash60(concat(col("_e.f"), lit("="), col("_e.v")))
    df
      .select(col(id), explode(array(entries: _*)).as("_e"))
      .filter(col("_e.v").isNotNull)
      .withColumn("_h", h)
      .select(
        col(id),
        pmod(col("_h"), lit(buckets.toLong)).as("bucket"),
        // bit above the bucket field decides the sign; md5Hash60 ≥ 0 so
        // the integer division is clean
        (when(pmod(expr(s"_h div ${buckets.toLong}"), lit(2L)) === 0L, 1L)
          .otherwise(-1L)).as("sign"))
      .groupBy(col(id), col("bucket"))
      .agg(sum("sign").as("weight"))
  }
}
