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

  /** Salt-bucket count sized to the REDUCER count (r13, from the P=1000
    * reducer-load table in SCALE.md): with a hot key holding share `s` of
    * the rows and `p` reduce partitions, a B-way salt leaves each salted
    * sub-key `s·n/B` rows against a balanced partition's `n/p` — so the
    * load ratio is ≈ `s·p/B + 1`, and B must GROW WITH p to hold a target
    * ratio: `B ≥ s·p/(target−1)`. The local[32] default of 16 buckets
    * bounds a 10% hot key to ~1.6x at P=32 but would read ~7x at P=1000 —
    * production callers on real clusters must size the salt with this
    * rule, exactly like RHP-LSH's autoBitsPerBand sizes buckets to the
    * corpus. Result: B = max(16, ceil(s·p/(target−1))), e.g. 200 at
    * (s=0.1, p=1000, target=1.5).
    */
  def autoSaltBuckets(reducers: Int, hotShare: Double = 0.1,
                      targetRatio: Double = 1.5): Int = {
    require(reducers > 0 && hotShare > 0 && hotShare <= 1 && targetRatio > 1,
      s"need reducers > 0, hotShare in (0,1], targetRatio > 1; " +
        s"got ($reducers, $hotShare, $targetRatio)")
    math.max(16, math.ceil(hotShare * reducers / (targetRatio - 1)).toInt)
  }

  /** DETERMINISTIC salt: a content hash over every input column. A salt
    * from `monotonically_increasing_id()`/`rand()` is a shuffle key that
    * changes on task retry (SPARK-23207-class): after a fetch failure the
    * recomputed rows re-route to different (key, salt) reducers and the
    * aggregate double-counts or drops rows. Content hashing is stable
    * under recomputation. Caveat: rows identical in EVERY column share a
    * salt — a hot key whose rows are full duplicates won't spread; feed a
    * unique id column through `df` if that shape is possible.
    */
  private def contentSalt(df: DataFrame, saltBuckets: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(saltBuckets.toLong))

  /** count per key, salted. */
  def saltedCount(df: DataFrame, keyCol: String, saltBuckets: Int = 16): DataFrame =
    df.withColumn("_salt", contentSalt(df, saltBuckets))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum("_partial").as("cnt"))

  /** Salted equi-join for skewed keys: the big (skewed) side gets a
    * deterministic content salt in [0, saltBuckets); the small side is
    * replicated once per salt value; the join key becomes (key, salt) so
    * a hot key's rows spread over `saltBuckets` reducers instead of
    * funneling into one. Exactly equal to the plain join (each big-side
    * row matches the single replica carrying its salt).
    *
    * This is the MANUAL form for when AQE's skew-join split can't help —
    * e.g. the skewed side feeds a non-AQE stage, or the join is
    * sort-merge on a key whose hot partition exceeds what
    * skewedPartitionFactor re-splitting can balance. Replication costs
    * |small| × saltBuckets rows — size the bucket count to the skew, not
    * higher. If the small side fits a broadcast, broadcast instead: no
    * shuffle at all beats a balanced shuffle.
    *
    * Salt caveat (same as contentSalt's): the default salt hashes EVERY
    * big-side column, so rows of a hot key that are full duplicates all
    * land in one salt bucket — skew relief degrades to nothing exactly in
    * the worst case (a hot key of identical rows), though the answer stays
    * correct. If the big side can contain duplicate rows, pass `saltCols`
    * naming a unique id column (or any column set that distinguishes the
    * duplicates); `monotonically_increasing_id()` is NOT a safe substitute
    * — it changes on task retry and re-routes rows mid-shuffle
    * (SPARK-23207-class double-count/drop).
    *
    * @param saltCols columns to content-hash for the salt; empty = all
    *                 big-side columns.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      saltBuckets: Int = 16,
      saltCols: Seq[String] = Nil
  ): DataFrame = {
    val saltSrc =
      if (saltCols.isEmpty) contentSalt(big, saltBuckets)
      else pmod(xxhash64(saltCols.map(col): _*), lit(saltBuckets.toLong))
    val b = big.withColumn("_salt_b", saltSrc)
    val sm = small.withColumn("_salt_s",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1L))))
    b.join(sm, b(bigKey) === sm(smallKey) && col("_salt_b") === col("_salt_s"))
      .drop("_salt_b", "_salt_s")
  }

  /** sum/count/min/max per key, salted — the general algebraic pattern. */
  def saltedAgg(df: DataFrame, keyCol: String, valueCol: Column, saltBuckets: Int = 16): DataFrame =
    df.withColumn("_salt", contentSalt(df, saltBuckets))
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
