package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for JOIN aggregates — the join analog of
  * [[IncrementalAgg]] (which maintains single-table group aggregates).
  * The join is bilinear in its inputs, so with signed deltas (sign = +1
  * insert, −1 delete):
  *
  *   (A+ΔA) ⋈ (B+ΔB) − A ⋈ B  =  ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB
  *
  * and a grouped count/sum over the join maintains by adding the three
  * delta-join terms with multiplied signs — never re-joining the two
  * base tables. At 100 TB this is THE way a materialized join rollup
  * stays fresh: each term joins a delta (small) against a base or the
  * other delta, so work is O(|Δ| · matchRate), not O(|A⋈B|); the bases
  * are only probed, ideally through a broadcast or bucket-local join.
  *
  * Deletes must be a subset of the base rows and inserts disjoint from
  * them (standard IVM multiset contract — the caller's CDC feed provides
  * exactly that). Sums accumulate in decimal, so the maintained value is
  * bit-equal to the recompute, not approximately equal.
  */
object JoinMaintenance {

  /** Maintain `groupBy(groupCol).agg(count, sum(valueCol))` of
    * `a ⋈ b ON a.keyCol = b.keyCol` under signed deltas of BOTH sides.
    *
    * @param snapshot  pre-computed (groupCol, cnt, sum_v) of the base join
    * @param baseA     base fact side (carries `valueCol`)
    * @param baseB     base dim side (carries `groupCol`)
    * @param deltaA    fact delta with a ±1 `sign` column
    * @param deltaB    dim delta with a ±1 `sign` column
    * @return          maintained (groupCol, cnt, sum_v), groups with
    *                  cnt = 0 dropped (multiset disappears)
    */
  def maintain(
      snapshot: DataFrame,
      baseA: DataFrame, deltaA: DataFrame,
      baseB: DataFrame, deltaB: DataFrame,
      keyColA: String, keyColB: String,
      groupCol: String, valueCol: String): DataFrame = {
    def slimA(df: DataFrame, signed: Boolean) = {
      val sign = if (signed) col("sign") else lit(1L)
      df.select(col(keyColA).as("_k"), col(valueCol).as("_v"), sign.as("_sa"))
    }
    def slimB(df: DataFrame, signed: Boolean) = {
      val sign = if (signed) col("sign") else lit(1L)
      df.select(col(keyColB).as("_k"), col(groupCol).as("_g"), sign.as("_sb"))
    }
    val d1 = slimA(deltaA, signed = true).join(slimB(baseB, signed = false), "_k")
    val d2 = slimA(baseA, signed = false).join(slimB(deltaB, signed = true), "_k")
    val d3 = slimA(deltaA, signed = true).join(slimB(deltaB, signed = true), "_k")
    val w = col("_sa") * col("_sb")
    val deltaAgg = d1.unionByName(d2).unionByName(d3)
      .groupBy(col("_g").as(groupCol))
      .agg(sum(w).as("_dcnt"),
        sum(w.cast("decimal(18,2)") * col("_v").cast("decimal(18,2)")).as("_dsum"))
    snapshot
      .join(deltaAgg, Seq(groupCol), "full_outer")
      .select(
        col(groupCol),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("_dcnt"), lit(0L))).as("cnt"),
        (coalesce(col("sum_v"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("_dsum"), lit(0).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as("sum_v"))
      .filter(col("cnt") > 0)
  }

  /** The base-join snapshot [[maintain]] starts from. */
  def snapshot(baseA: DataFrame, baseB: DataFrame,
               keyColA: String, keyColB: String,
               groupCol: String, valueCol: String): DataFrame =
    baseA.select(col(keyColA).as("_k"), col(valueCol))
      .join(baseB.select(col(keyColB).as("_k"), col(groupCol)), "_k")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(18,2)")).as("sum_v"))
}
