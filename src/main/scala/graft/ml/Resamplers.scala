package graft.ml

import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Class-rebalancing operators (reference O4/O8–O11,
  * Hap880_Final_Project.py:447,683-687,814-817).
  *
  * Random under/over-sampling are pure narrow `sample`/`union` plans — no
  * shuffle at all. SMOTE and NearMiss need k-nearest-neighbors, which is
  * quadratic done naively; both use the engine's native LSH radius join
  * ([[NativeLsh]] — codegen'd expressions end-to-end) so the candidate
  * space is bucket-local — the only formulation that survives 100 TB
  * (SURVEY §7.5.1). Rows are keyed by an explicit `idCol` (never by
  * vector equality — UDT comparisons don't partition/join reliably).
  */
object Resamplers {

  private def classCounts(df: DataFrame, labelCol: String): (Long, Long) = {
    val counts = df.groupBy(labelCol).count().collect()
      .map(r => r.get(0).toString.toDouble -> r.getLong(1)).toMap
    (counts.getOrElse(1.0, 0L), counts.getOrElse(0.0, 0L))
  }

  /** Sample the majority class down to ~minority size (reference O4/O11). */
  def randomUndersample(df: DataFrame, labelCol: String, seed: Long = 42L): DataFrame = {
    val (nPos, nNeg) = classCounts(df, labelCol)
    if (nPos == 0 || nNeg == 0) return df
    val (minority, majority, frac) =
      if (nPos < nNeg) (col(labelCol) === 1.0, col(labelCol) =!= 1.0, nPos.toDouble / nNeg)
      else (col(labelCol) =!= 1.0, col(labelCol) === 1.0, nNeg.toDouble / nPos)
    df.filter(minority)
      .unionByName(df.filter(majority).sample(withReplacement = false, frac, seed))
  }

  /** Duplicate the minority class up to ~majority size (reference O8). */
  def randomOversample(df: DataFrame, labelCol: String, seed: Long = 42L): DataFrame = {
    val (nPos, nNeg) = classCounts(df, labelCol)
    if (nPos == 0 || nNeg == 0) return df
    val (minority, majority, frac) =
      if (nPos < nNeg) (col(labelCol) === 1.0, col(labelCol) =!= 1.0, nNeg.toDouble / nPos)
      else (col(labelCol) =!= 1.0, col(labelCol) === 1.0, nPos.toDouble / nNeg)
    df.filter(majority)
      .unionByName(df.filter(minority).sample(withReplacement = true, frac, seed))
  }

  /** SMOTE (reference O9): for each minority point, find approximate
    * same-class neighbors via random-projection LSH, pick one
    * pseudo-randomly (seeded, deterministic), and emit a synthetic point
    * on the connecting segment. Returns (idCol=-1, featuresCol, labelCol)
    * synthetic rows unioned onto the original (id, features, label)
    * projection, replicated to approach class balance.
    */
  def smote(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      featuresCol: String,
      seed: Long = 42L,
      bucketLength: Double = 2.0,
      k: Int = 5,
      neighborRadius: Double = 3.0
  ): DataFrame = {
    val base = df.select(col(idCol), col(featuresCol), col(labelCol))
    val (nPos, nNeg) = classCounts(df, labelCol)
    if (nPos == 0 || nNeg == 0 || nPos == nNeg) return base
    val minorityLabel = if (nPos < nNeg) 1.0 else 0.0
    val nMin = math.min(nPos, nNeg); val nMaj = math.max(nPos, nNeg)

    val minority = base.filter(col(labelCol) === minorityLabel)
    // Cost shape: only `needed` synthetic rows are ever emitted, so only
    // ~needed seed points are joined — a deterministic hash-sample, not
    // the full minority. The join radius is finite (features are
    // standardized, so a constant radius is meaningful): an unbounded
    // radius degenerates to bucket-cross-products (measured 20× slower).
    // The kNN candidates come from the NATIVE LSH radius join (codegen'd
    // end-to-end), and the seed/neighbor VECTORS are joined back only
    // AFTER the per-seed top-k trim — k×|seeds| rows carry vectors, never
    // the full candidate set.
    val needed = nMaj - nMin
    val seedPermille = math.min(1000L, math.max(1L, needed * 1000L / nMin))
    val seeds = minority.filter(pmod(xxhash64(col(idCol), lit(seed)), lit(1000L)) < seedPermille)
    val minSlim = minority.select(col(idCol), col(featuresCol))
    val cand = NativeLsh.radiusJoin(
      seeds.select(col(idCol), col(featuresCol)), minSlim,
      idCol, featuresCol, neighborRadius, bucketLength, nTables = 3, seed = seed,
      // resampler feature spaces are wide sparse BoW rows — keep the UDT
      // representation through the LSH join (bitwise-equal distances)
      sparseAware = true)
      .withColumnRenamed("dist", "_dist")
    val w = Window.partitionBy("_ida").orderBy(col("_dist"), col("_idb"))
    // the (seed, neighbor) vectors join back as plain array<double> — the
    // interpolation below is pure expressions (zip_with), so keeping the
    // array form until the final vector conversion keeps the whole synth
    // path inside codegen with zero ScalaUDFs
    val nearest = cand.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .join(minSlim.select(col(idCol).as("_ida"),
        vector_to_array(col(featuresCol)).as("_x")), Seq("_ida"))
      .join(minSlim.select(col(idCol).as("_idb"),
        vector_to_array(col(featuresCol)).as("_nbr")), Seq("_idb"))
    val multiplier = math.max(1L, needed / math.max(1L, nMin * seedPermille / 1000L))
    val synthOne = nearest
      .withColumn("_pick", pmod(xxhash64(col("_ida"), lit(seed)), lit(k.toLong)) + 1L)
      .filter(col("_rn") === col("_pick"))
      .withColumn("_frac",
        pmod(xxhash64(col("_ida"), col("_idb"), lit(seed)), lit(1000L)).cast("double") / 1000.0)
    val synth = synthOne
      .crossJoin(org.apache.spark.sql.SparkSession.active.range(multiplier).toDF("_rep"))
      // vary the interpolation fraction per replica, staying in [0,1)
      .withColumn("_f", pmod(col("_frac") + col("_rep") * 0.37, lit(1.0)))
      .select(
        lit(-1L).cast("long").as(idCol),
        // array_to_vector is always dense; re-encode sparse when the
        // interpolated support (union of the two parents') warrants it —
        // at BoW widths this is the difference between a 3,019-double
        // row and a ~70-nonzero one in every downstream fit pass
        graft.functions.GraftFunctions.compress_vector(array_to_vector(
          zip_with(col("_x"), col("_nbr"), (x, n) => x + col("_f") * (n - x))))
          .as(featuresCol),
        lit(minorityLabel).as(labelCol))
    base.unionByName(synth)
  }

  /** NearMiss (reference O10): keep the majority points with the smallest
    * mean distance to their approximate minority neighbors, trimmed to
    * minority size; minority kept whole.
    */
  def nearMiss(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      featuresCol: String,
      seed: Long = 42L,
      bucketLength: Double = 2.0,
      neighborRadius: Double = 3.0,
      minoritySampleTarget: Long = 2000L
  ): DataFrame = {
    val (nPos, nNeg) = classCounts(df, labelCol)
    if (nPos == 0 || nNeg == 0 || nPos == nNeg) return df
    val minorityLabel = if (nPos < nNeg) 1.0 else 0.0
    val nMin = math.min(nPos, nNeg)
    val minority = df.filter(col(labelCol) === minorityLabel)
    val majority = df.filter(col(labelCol) =!= minorityLabel)

    // Three things keep the kNN join linear in |majority| AND codegen'd
    // (it was the cost center of this operator — 24 s of a 35 s query):
    //  1. finite radius — an unbounded similarity join materializes every
    //     bucket-sharing (majority × minority) pair;
    //  2. the mean-distance ranking only needs an ESTIMATOR, so the
    //     minority side is a deterministic hash-sample (~minoritySampleTarget
    //     rows): the join is majority × sample, not majority × minority —
    //     at 100 TB the difference between O(n) and O(n·m);
    //  3. the join is the NATIVE LSH radius join (expressions end-to-end,
    //     no per-pair ScalaUDF distance like ml's approxSimilarityJoin).
    // Join inputs are slimmed to (id, features). Majority rows with no
    // in-radius candidate are handled by the deterministic top-up below.
    val samplePermille = math.min(1000L, math.max(1L, minoritySampleTarget * 1000L / nMin))
    val minoritySample = minority
      .filter(pmod(xxhash64(col(idCol), lit(seed)), lit(1000L)) < samplePermille)
      .select(col(idCol), col(featuresCol))
    val dists = NativeLsh.radiusJoin(
        majority.select(col(idCol), col(featuresCol)), minoritySample,
        idCol, featuresCol, neighborRadius, bucketLength, nTables = 3, seed = seed,
        sparseAware = true)
      .select(col("_ida").as("_maj_id"), col("dist").as("_dist"))
      .groupBy("_maj_id").agg(avg("_dist").as("_mean_dist"))
    // LSH only yields candidates sharing a bucket; majority rows with no
    // cross-class candidate rank last (deterministically by id) so the
    // result always has exactly nMin majority rows.
    val all = majority.select(col(idCol).as("_maj_id"))
      .join(dists, Seq("_maj_id"), "left")
      .withColumn("_mean_dist", coalesce(col("_mean_dist"), lit(Double.MaxValue)))
    // exact distributed selection — never a TakeOrdered of nMin rows
    // through the driver (nMin is minority-class size: billions at scale)
    val keep = graft.ops.GlobalTopN.topN(all, nMin, col("_mean_dist"), col("_maj_id"))
    majority
      .join(keep, majority(idCol) === keep("_maj_id"), "left_semi")
      .unionByName(minority)
  }
}
