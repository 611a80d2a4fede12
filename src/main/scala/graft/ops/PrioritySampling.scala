package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Weighted sampling WITHOUT replacement — the Efraimidis–Spirakis
  * exponential-clock scheme, derandomized through the portable 60-bit
  * hash: each row draws `u ∈ (0, 1]` from its id hash and competes with
  * key `−ln(u) / w`; the k SMALLEST keys are exactly a weighted sample
  * without replacement (a row with twice the weight halves its expected
  * clock). The curation primitive behind "sample k documents proportional
  * to quality" — deterministic, re-runnable, and resumable, unlike any
  * RNG-stream sample.
  *
  * Scale shape: one scan computing the key expression in codegen, then a
  * global TakeOrdered(k) — a bounded heap per partition merged on the
  * driver, never a total sort. Adding data changes nothing structurally;
  * k bounds both memory and result size.
  *
  * Engine portability: `u` is an exact dyadic rational from the hash, and
  * both engines evaluate `ln` at double precision (≤1 ulp apart). A
  * selection flip would need two keys within that ulp — with 60-bit
  * hashes the gap between competing keys is astronomically larger.
  */
object PrioritySampling {

  private val Scale = 1152921504606846976L // 2^60

  /** k rows sampled without replacement ∝ `weightCol` (must be > 0).
    * Output: (idCol, weight, skey) with skey rounded for portability —
    * the ORDER uses the unrounded key.
    */
  def sample(df: DataFrame, idCol: String, weightCol: String, k: Int,
             salt: String = ":pri"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // (hash + 1) / 2^60 ∈ (0, 1]: +1 keeps u > 0 so ln(u) is finite
    val u = (TextOps.md5Hash60(concat(col(idCol).cast("string"), lit(salt)))
      .cast("double") + lit(1.0)) / lit(Scale.toDouble)
    val key = -log(u) / col(weightCol).cast("double")
    df.filter(col(weightCol).cast("double") > 0.0)
      .select(col(idCol), col(weightCol).cast("double").as("weight"), key.as("_skey"))
      .orderBy(col("_skey"))
      .limit(k)
      .select(col(idCol), col("weight"), round(col("_skey"), 6).as("skey"))
  }

  /** DuckDB mirror of [[sample]]. */
  def oracleSql(table: String, idCol: String, weightCol: String, k: Int,
                salt: String = ":pri"): String =
    s"""WITH s AS (
       |  SELECT $idCol, CAST($weightCol AS DOUBLE) AS weight,
       |         -ln((CAST(CAST(concat('0x', substr(md5(concat(CAST($idCol AS VARCHAR), '$salt')), 1, 15)) AS BIGINT) AS DOUBLE) + 1.0)
       |             / ${Scale.toDouble}) / CAST($weightCol AS DOUBLE) AS skey
       |  FROM $table
       |  WHERE CAST($weightCol AS DOUBLE) > 0.0
       |)
       |SELECT $idCol, weight, round(skey, 6) AS skey
       |FROM s ORDER BY s.skey LIMIT $k""".stripMargin
}
