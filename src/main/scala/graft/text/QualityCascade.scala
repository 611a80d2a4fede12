package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher/C4-style quality-filter cascade with per-rule drop accounting —
  * the pre-training corpus triage readout (public heuristics from Rae et
  * al. 2021 "Scaling Language Models" §A1.1 and Raffel et al. 2020 C4):
  * token-count bounds, mean-token-length bounds, and a type/token-ratio
  * repetition floor. Each document is charged to the FIRST rule it fails
  * (the funnel convention), so the output is a drop-reason distribution
  * plus the surviving count — what a data-curation dashboard shows per
  * snapshot.
  *
  * Scale shape: the rules are pure per-row column expressions over the
  * [[TextOps]] tokenizer (codegen'd — no UDF) and the whole cascade is
  * ONE scan + ONE ≤4-row hash aggregation. At 100 TB this is the
  * cheapest full-corpus statement the pipeline makes.
  */
object QualityCascade {

  /** @return (rule, n_docs): first-failure counts per rule, plus the
    *         "kept" row. Rules in order: n_tokens bounds →
    *         mean_token_len bounds → type_token_ratio floor.
    */
  /** The first-failure rule label as a pure column expression — shared by
    * [[cascade]] and the composed curation funnel ([[Curation]]), so the
    * two can't drift.
    */
  def ruleCol(c: Column,
              minTokens: Int, maxTokens: Int,
              minMeanLen: Double, maxMeanLen: Double,
              minTtr: Double): Column = {
    // null text → 0 tokens, so it is charged to the n_tokens rule; an
    // un-coalesced null would fall through every WHEN to "kept"
    val nTok = coalesce(TextOps.tokenCount(c), lit(0))
    val meanLen = TextOps.meanTokenLen(c)
    val ttr = when(nTok === 0, 0.0)
      .otherwise(size(array_distinct(TextOps.tokens(c))).cast("double") / nTok)
    when(!nTok.between(minTokens, maxTokens), "n_tokens")
      .when(!meanLen.between(minMeanLen, maxMeanLen), "mean_token_len")
      .when(ttr < minTtr, "type_token_ratio")
      .otherwise("kept")
  }

  def cascade(docs: DataFrame, textCol: String,
              minTokens: Int, maxTokens: Int,
              minMeanLen: Double, maxMeanLen: Double,
              minTtr: Double): DataFrame =
    docs
      .groupBy(ruleCol(col(textCol), minTokens, maxTokens,
        minMeanLen, maxMeanLen, minTtr).as("rule"))
      .agg(count(lit(1)).as("n_docs"))

  /** DuckDB measure expressions over a token-list column `$toks` —
    * n_tok / mean_len / ttr exactly as [[ruleCol]] computes them.
    */
  private[graft] def measuresSql(toks: String): String =
    s"""COALESCE(len($toks), 0) AS n_tok,
       |         CASE WHEN len($toks) = 0 THEN 0.0
       |              ELSE CAST(list_sum(list_transform($toks, x -> strlen(x))) AS DOUBLE) / len($toks)
       |         END AS mean_len,
       |         CASE WHEN len($toks) = 0 THEN 0.0
       |              ELSE CAST(len(list_distinct($toks)) AS DOUBLE) / len($toks)
       |         END AS ttr""".stripMargin

  /** DuckDB first-failure CASE over columns n_tok / mean_len / ttr —
    * the SQL twin of [[ruleCol]]'s WHEN chain.
    */
  private[graft] def ruleCaseSql(minTokens: Int, maxTokens: Int,
                                 minMeanLen: Double, maxMeanLen: Double,
                                 minTtr: Double): String =
    s"""CASE
       |         WHEN NOT (n_tok BETWEEN $minTokens AND $maxTokens) THEN 'n_tokens'
       |         WHEN NOT (mean_len BETWEEN $minMeanLen AND $maxMeanLen) THEN 'mean_token_len'
       |         WHEN ttr < $minTtr THEN 'type_token_ratio'
       |         ELSE 'kept'
       |       END""".stripMargin

  /** DuckDB mirror of [[cascade]] (same tokenizer rendering as the other
    * text oracles: lowercase alpha runs).
    */
  def cascadeOracleSql(table: String, textCol: String,
                       minTokens: Int, maxTokens: Int,
                       minMeanLen: Double, maxMeanLen: Double,
                       minTtr: Double): String =
    s"""WITH t AS (
       |  SELECT list_filter(regexp_split_to_array(lower($textCol), '[^a-z]+'), x -> x <> '') AS toks
       |  FROM $table
       |), m AS (
       |  SELECT ${measuresSql("toks")}
       |  FROM t
       |)
       |SELECT ${ruleCaseSql(minTokens, maxTokens, minMeanLen, maxMeanLen, minTtr)} AS rule,
       |       CAST(count(*) AS BIGINT) AS n_docs
       |FROM m GROUP BY 1""".stripMargin
}
