package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter-style record linkage (the entity-resolution member of
  * the dedup family, public method from Fellegi & Sunter 1969): candidate
  * pairs come from BLOCKING (equi-join on stable key fragments — never an
  * all-pairs comparison), each pair gets a per-field agreement vector,
  * and the match score is the sum of integer agreement/disagreement
  * weights (in practice log-likelihood ratios of trained m/u
  * probabilities; here declared constants, which keeps the whole score
  * exactly engine-portable).
  *
  * Scale shape: ONE equi-join on the block key; candidate cardinality is
  * Σ_block |A_block|·|B_block|, governed entirely by the caller's
  * blocking-key selectivity (the same contract as
  * [[Dedup.sortedNeighborPairs]] — pick fragments that bound block
  * sizes). Scoring is per-row column arithmetic inside codegen; no
  * window, no driver loop.
  */
object RecordLinkage {

  /** One comparison field: `agree(a, b)` decides agreement, worth
    * `+wAgree` on agreement and `−wDisagree` otherwise (both sides
    * null-safe only if `agree` is — wrap with coalesce as needed).
    */
  final case class FieldRule(field: String, agree: (Column, Column) => Column,
                             wAgree: Long, wDisagree: Long)

  /** Score all blocked A×B candidate pairs.
    * @return (id_a, id_b, score) — integer Fellegi–Sunter score per pair.
    */
  def scorePairs(a: DataFrame, b: DataFrame, idCol: String,
                 blockCols: Seq[String], rules: Seq[FieldRule]): DataFrame = {
    require(blockCols.nonEmpty, "record linkage requires a blocking key")
    require(rules.nonEmpty, "record linkage requires at least one field rule")
    val keep = (idCol +: (blockCols ++ rules.map(_.field))).distinct
    val aa = a.select(keep.map(c => col(c).as(s"_a_$c")): _*)
    val bb = b.select(keep.map(c => col(c).as(s"_b_$c")): _*)
    val joinCond = blockCols
      .map(c => col(s"_a_$c") === col(s"_b_$c"))
      .reduce(_ && _)
    val score = rules
      .map(r => when(r.agree(col(s"_a_${r.field}"), col(s"_b_${r.field}")),
        lit(r.wAgree)).otherwise(lit(-r.wDisagree)))
      .reduce(_ + _)
    aa.join(bb, joinCond)
      .select(col(s"_a_$idCol").as("id_a"), col(s"_b_$idCol").as("id_b"),
        score.cast("long").as("score"))
  }

  /** Score-distribution readout with known truth: `(score, n_pairs,
    * n_true)` where a "true" pair links a record to its own perturbed
    * twin (`id_a = id_b`). The separation between the n_true mass (high
    * scores) and the n_pairs − n_true mass (low scores) IS the
    * threshold-picking curve of a linkage run.
    */
  def scoreDistribution(pairs: DataFrame): DataFrame =
    pairs.groupBy("score")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("id_a") === col("id_b"), 1L).otherwise(0L)).as("n_true"))
}
