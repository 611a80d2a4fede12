package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level bigram language model for quality scoring — the classic
  * "perplexity filter" of LLM data pipelines: score each document by the
  * average log-probability of its bigrams under a model trained on the
  * corpus itself; low scores flag boilerplate, gibberish, and
  * out-of-domain text. Complements the per-document heuristics in
  * [[TextOps]] (which see only one document at a time) with a signal that
  * sees the whole corpus.
  */
object BigramLm {

  /** Adjacent token pairs of a token-array column as `struct(w1, w2)`
    * entries; empty for docs with < 2 tokens.
    */
  def bigrams(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - 2),
        i => struct(element_at(toks, i + 1).as("w1"), element_at(toks, i + 2).as("w2"))))

  /** Per-document LM statistics over the [[TextOps.tokens]] stream:
    *
    *   - `n_bigrams`  — bigram occurrences in the doc
    *   - `n_covered`  — of those, how many occur ≥ `minCount` times in
    *                    the CORPUS (cheap fluency proxy, exact integers)
    *   - `avg_lp`     — mean add-one-smoothed log-probability
    *                    `ln((c(w1,w2) + 1) / (c(w1) + V))`, the LM score
    *
    * Docs with < 2 tokens are absent (they have no bigram axis).
    *
    * Determinism: each ln is scaled to micro-units and rounded to a LONG
    * before summation, so the per-doc mean is an integer sum divided once
    * — immune to floating-point accumulation order on both engines.
    *
    * Scale shape: one explode + two hash-aggs build the count tables;
    * the model (bigram + unigram counts) joins back on its keys as plain
    * shuffle hash joins — every stage is keyed and partial-aggregated,
    * nothing is driver-resident except the 1-row vocabulary size that
    * rides a broadcast.
    */
  def docScores(docs: DataFrame, idCol: String, textCol: String, minCount: Long): DataFrame = {
    val toksed = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("_toks"))
    // vocabulary size rides a global window over the unigram table (one
    // single-partition pass over |vocab| thin rows) instead of a
    // crossJoin(broadcast(agg)) that would re-evaluate the whole
    // explode+agg subtree — i.e. re-scan and re-tokenize the corpus
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val uni = toksed
      .select(explode(col("_toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
      .withColumn("v_size", count(lit(1)).over(wAll))
    val bg = toksed
      .select(col(idCol), explode(bigrams(col("_toks"))).as("_b"))
      .select(col(idCol), col("_b.w1").as("w1"), col("_b.w2").as("w2"))
    val bgCounts = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    bg
      .join(bgCounts, Seq("w1", "w2"))
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"))
      .select(
        col(idCol),
        col("c2"),
        // micro-scaled integer log-prob: order-independent summation
        round(log((col("c2") + 1).cast("double") / (col("c1") + col("v_size"))) * 1e6)
          .cast("long").as("_lp_micro"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("c2") >= minCount, 1L).otherwise(0L)).as("n_covered"),
        round(sum("_lp_micro").cast("double") / (count(lit(1)) * 1e6), 6).as("avg_lp"))
  }
}
