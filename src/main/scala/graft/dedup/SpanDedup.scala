package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-SPAN detection — the sequence-level dedup of
  * "Deduplicating Training Data Makes Language Models Better" (Lee et
  * al. 2021), which removes repeated SUBSTRINGS rather than whole
  * near-duplicate documents (the gap the document-level family —
  * MinHash/SimHash/Jaccard/containment — cannot see: boilerplate
  * headers, license blocks, quoted passages inside otherwise-unique
  * docs):
  *
  *   1. every length-`L` token window (stride 1) of every document is
  *      fingerprinted (md5 of the space-joined window — both engines
  *      group by the same 128-bit value, so the duplicate verdict never
  *      depends on cross-engine string-sort order);
  *   2. a window is DUPLICATED if its fingerprint occurs more than once
  *      corpus-wide (Lee et al.'s "appears verbatim elsewhere" — intra-
  *      document repetition counts, matching the suffix-array notion);
  *   3. per document, overlapping/touching duplicated windows merge into
  *      maximal spans (gaps-and-islands: a window starting at `s₂` joins
  *      its predecessor `s₁` iff `s₂ ≤ s₁ + L`).
  *
  * Readout per affected doc: window count, merged-span count, longest
  * span, and total duplicated-token mass — the numbers a span-removal
  * pass needs to size its cuts.
  *
  * Scale shape: window expansion is a codegen'd HOF over each doc's own
  * token array (output ≈ |tokens| rows — the same blow-up every shingle
  * operator in [[Dedup]] pays, here with md5-narrowed rows); the
  * duplicate verdict is ONE fingerprint hash-agg with map-side combine;
  * the island merge is a per-document window — partitioned by doc_id
  * (high cardinality), each partition bounded by a single document's
  * window count, never a corpus funnel. A full suffix array finds
  * variable-length duplicates in O(corpus) space, but cannot be built
  * as one Spark pass; fixed-L windows are the standard distributed
  * approximation (any duplicate ≥ L tokens is found; shorter ones are
  * below the removal threshold by construction).
  */
object SpanDedup {

  /** Duplicated-span readout per document containing at least one
    * duplicated window. Output: (doc_id, n_dup_windows, n_spans,
    * max_span_tokens, dup_tokens).
    */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String, L: Int): DataFrame = {
    require(L >= 2, "span length must be >= 2 tokens")
    val base = docs
      .select(col(idCol).as("doc_id"), graft.text.TextOps.tokens(col(textCol)).as("t"))
      .withColumn("n_tok", size(col("t")))
      .filter(col("n_tok") >= L)
    // 0-based posexplode index -> 1-based window start
    val wins = base
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), col("n_tok") - lit(L - 1)),
          i => md5(concat_ws(" ", slice(col("t"), i, lit(L))).cast("binary"))))
          .as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("start"), col("h"))
    val dupH = wins.groupBy("h").agg(count(lit(1)).as("_c"))
      .filter(col("_c") > 1).select("h")
    val dupWins = wins.join(dupH, "h")
    val w = Window.partitionBy("doc_id").orderBy("start")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // gaps-and-islands: first window of each doc starts island 0 (the
    // lag is NULL -> the when falls through to 0)
    val spans = dupWins
      .withColumn("_new",
        when(col("start") > lag(col("start"), 1).over(w) + L, 1).otherwise(0))
      .withColumn("_isl", sum(col("_new")).over(wRun))
      .groupBy("doc_id", "_isl")
      .agg(count(lit(1)).as("nw"), min("start").as("s"), max("start").as("e"))
    spans
      .groupBy("doc_id")
      .agg(
        sum("nw").as("n_dup_windows"),
        count(lit(1)).as("n_spans"),
        max((col("e") - col("s") + L).cast("long")).as("max_span_tokens"),
        sum((col("e") - col("s") + L).cast("long")).as("dup_tokens"))
  }

  /** DuckDB mirror of [[dupSpans]] — same fingerprints, same duplicate
    * rule, same island merge.
    */
  def dupSpansOracleSql(table: String, idCol: String, textCol: String, L: Int): String =
    s"""WITH base AS (
       |  SELECT doc_id, t, len(t) AS n FROM (
       |    SELECT $idCol AS doc_id,
       |           list_filter(regexp_split_to_array(lower($textCol), '[^a-z]+'), x -> x <> '') AS t
       |    FROM $table
       |  ) WHERE len(t) >= $L
       |), wins AS MATERIALIZED (
       |  SELECT doc_id, i AS start, md5(array_to_string(t[i:i + ${L - 1}], ' ')) AS h
       |  FROM (SELECT doc_id, t, unnest(range(1, n - ${L - 2})) AS i FROM base)
       |), dup AS (
       |  SELECT h FROM wins GROUP BY h HAVING count(*) > 1
       |), dw AS (
       |  SELECT w.doc_id, w.start FROM wins w JOIN dup USING (h)
       |), isl AS (
       |  SELECT doc_id, start,
       |         SUM(CASE WHEN prev IS NOT NULL AND start > prev + $L THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY doc_id ORDER BY start
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM (SELECT doc_id, start,
       |               lag(start) OVER (PARTITION BY doc_id ORDER BY start) AS prev
       |        FROM dw)
       |), spans AS (
       |  SELECT doc_id, island, count(*) AS nw, min(start) AS s, max(start) AS e
       |  FROM isl GROUP BY 1, 2
       |)
       |SELECT doc_id,
       |       CAST(SUM(nw) AS BIGINT) AS n_dup_windows,
       |       CAST(count(*) AS BIGINT) AS n_spans,
       |       CAST(MAX(e - s + $L) AS BIGINT) AS max_span_tokens,
       |       CAST(SUM(e - s + $L) AS BIGINT) AS dup_tokens
       |FROM spans GROUP BY 1""".stripMargin
}
