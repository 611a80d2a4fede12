package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** The composed pre-training curation funnel: the ordered gate sequence a
  * crawl-to-corpus pipeline actually runs (public shape: C4 / Gopher /
  * RefinedWeb / Dolma dataset reports), with every document charged to
  * the FIRST stage that drops it:
  *
  *   1. `lang_id`          — no language evidence at all ([[TextOps.langEvident]])
  *   2. quality cascade    — `n_tokens` / `mean_token_len` / `type_token_ratio`
  *                           first-failure rules ([[QualityCascade.ruleCol]])
  *   3. `exact_dup`        — normalized-content fingerprint seen on an
  *                           EARLIER surviving doc ([[TextOps.fingerprintMd5]])
  *   4. `near_dup`         — any MinHash LSH band bucket (computed over the
  *                           survivors of 1–3 only) already holds an earlier
  *                           surviving doc — the `d_stream_neardup` gate
  *                           semantics on the batch path
  *   5. `contaminated`     — shares any word n-gram with the benchmark
  *                           probe set ([[Dedup.contamination]])
  *   6. `kept`
  *
  * The stage composition is the point: each dedup gate is defined over the
  * SURVIVORS of the previous gates (a near-dup of an already-dropped doc
  * must not be charged to near_dup), which is exactly what a staged
  * production pipeline computes and what a per-stage union of independent
  * filters gets wrong.
  *
  * Scale shape (100 TB): one corpus scan feeds stages 1–2 as pure
  * codegen'd column expressions; stage 3 is one hash-agg on the
  * fingerprint plus a doc_id-keyed join back; stage 4 explodes the
  * shrinking survivor set through the stateless per-row MinHash kernel
  * ([[Dedup.minhashBandsPerRow]] — zero shuffles to produce bands) and
  * self-joins on (band, bucket) — the banded join, never an all-pairs
  * form; stage 5 broadcasts the benchmark-sized probe shingle set. The
  * final labeling is three doc_id-keyed left joins against id-sets that
  * are duplicate/contamination-sized, not corpus-sized. No window over a
  * low-cardinality key, no driver funnel; every intermediate is
  * partitioned by doc_id or (band, bucket).
  *
  * Reference anchor: the reference notebook's triage is a single dropna +
  * dedup over admissions (`Hap880_Final_Project.py:105-113`); this is the
  * corpus-scale generalization the engine's LLM tier declares.
  */
object Curation {

  /** Per-document funnel labeling: (doc_id, stage).
    *
    * @param docs   corpus documents (already excludes the probe set)
    * @param probes benchmark probe documents for decontamination
    */
  def funnel(docs: DataFrame, probes: DataFrame,
             idCol: String, textCol: String,
             minTokens: Int, maxTokens: Int,
             minMeanLen: Double, maxMeanLen: Double, minTtr: Double,
             n: Int = 3, bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val c = col(textCol)
    val labeled = docs.select(
      col(idCol).as("doc_id"),
      c.as("_text"),
      TextOps.langEvident(c).as("lang_ok"),
      QualityCascade.ruleCol(c, minTokens, maxTokens,
        minMeanLen, maxMeanLen, minTtr).as("qrule"))

    val s2 = labeled.filter(col("lang_ok") && col("qrule") === "kept")
      .select(col("doc_id"), col("_text"))

    // stage 3: exact dedup — keep the earliest doc per fingerprint
    val fp = s2.select(col("doc_id"), TextOps.fingerprintMd5(col("_text")).as("fp"))
    val xdup = fp
      .join(fp.groupBy("fp").agg(min("doc_id").as("keep_id")), Seq("fp"))
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), lit(true).as("is_xdup"))

    val s3 = s2.join(xdup.select("doc_id"), Seq("doc_id"), "left_anti")

    // stage 4: near-dup — earlier survivor in any shared LSH band bucket
    val banded = Dedup.minhashBandsPerRow(s3, "doc_id", "_text", n, bands, rowsPerBand)
    val ndup = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("b.doc_id") < col("a.doc_id"))
      .select(col("a.doc_id")).distinct()
      .select(col("doc_id"), lit(true).as("is_ndup"))

    val s4 = s3.join(ndup.select("doc_id"), Seq("doc_id"), "left_anti")

    // stage 5: benchmark decontamination over the remaining survivors
    val probeDocs = probes.select(col(idCol).as("doc_id"), col(textCol).as("_text"))
    val contam = Dedup.contamination(s4, probeDocs, "doc_id", "_text", n)
      .select(col("doc_id"), lit(true).as("is_contam"))

    labeled
      .join(xdup, Seq("doc_id"), "left")
      .join(ndup, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        when(!col("lang_ok"), "lang_id")
          .when(col("qrule") =!= "kept", col("qrule"))
          .when(col("is_xdup"), "exact_dup")
          .when(col("is_ndup"), "near_dup")
          .when(col("is_contam"), "contaminated")
          .otherwise("kept").as("stage"))
  }

  /** DuckDB mirror of [[funnel]] — the staged CTE chain composed from the
    * same generators the individual gate oracles use (tokenizer
    * rendering, [[QualityCascade.measuresSql]]/`ruleCaseSql`, and
    * [[Dedup.minhashBandCtes]]), so no gate can drift from its
    * stand-alone twin. Predicates split the raw table into corpus vs
    * probes (e.g. `doc_id % 100 <> 0` / `= 0`).
    */
  def funnelOracleSql(table: String, idCol: String, textCol: String,
                      corpusPredSql: String, probePredSql: String,
                      minTokens: Int, maxTokens: Int,
                      minMeanLen: Double, maxMeanLen: Double, minTtr: Double,
                      n: Int = 3, bands: Int = 8, rowsPerBand: Int = 4): String =
    s"""WITH ${funnelCtes(table, idCol, textCol, corpusPredSql, probePredSql,
      minTokens, maxTokens, minMeanLen, maxMeanLen, minTtr, n, bands, rowsPerBand)}
       |SELECT doc_id, stage FROM labeled""".stripMargin

  /** The funnel as a reusable CTE chain ending in `labeled(doc_id, stage)`
    * — lets downstream compositions ([[funnelOracleSql]], the pretrain
    * packing pipeline) consume the curated corpus without re-stating any
    * gate.
    */
  private[graft] def funnelCtes(
      table: String, idCol: String, textCol: String,
      corpusPredSql: String, probePredSql: String,
      minTokens: Int, maxTokens: Int,
      minMeanLen: Double, maxMeanLen: Double, minTtr: Double,
      n: Int = 3, bands: Int = 8, rowsPerBand: Int = 4): String = {
    val toks =
      s"list_filter(regexp_split_to_array(lower($textCol), '[^a-z]+'), x -> x <> '')"
    val toksT =
      "list_filter(regexp_split_to_array(lower(_text), '[^a-z]+'), x -> x <> '')"
    val markerList = TextOps.allMarkers.sorted.map(m => s"'$m'").mkString(", ")
    val gram = (1 to n).map(j => s"t[i+${j - 1}]").mkString(" || ' ' || ")
    s"""corpus AS (
       |  SELECT $idCol AS doc_id, $textCol AS _text FROM $table WHERE $corpusPredSql
       |), lt AS (
       |  SELECT doc_id, _text,
       |         regexp_matches(_text, '[\\x{4e00}-\\x{9fff}]') AS is_cjk,
       |         $toksT AS tk
       |  FROM corpus
       |), lm AS (
       |  SELECT doc_id, _text,
       |         (is_cjk OR len(list_filter(tk, x -> list_contains([$markerList], x))) > 0) AS lang_ok,
       |         ${QualityCascade.measuresSql("tk")}
       |  FROM lt
       |), lq AS (
       |  SELECT doc_id, _text, lang_ok,
       |         ${QualityCascade.ruleCaseSql(minTokens, maxTokens, minMeanLen, maxMeanLen, minTtr)} AS qrule
       |  FROM lm
       |), s2 AS (
       |  SELECT doc_id, _text FROM lq WHERE lang_ok AND qrule = 'kept'
       |), fpt AS (
       |  SELECT doc_id, _text, $toksT AS tk FROM s2
       |), fp AS (
       |  SELECT doc_id,
       |         CASE WHEN len(tk) = 0 THEN md5(lower(_text))
       |              ELSE md5(array_to_string(tk, ' ')) END AS fp
       |  FROM fpt
       |), xdup AS (
       |  SELECT f.doc_id FROM fp f
       |  JOIN (SELECT fp, min(doc_id) AS keep_id FROM fp GROUP BY 1) g USING (fp)
       |  WHERE f.doc_id <> g.keep_id
       |), s3 AS (
       |  SELECT doc_id, _text FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM xdup)
       |), ${Dedup.minhashBandCtes("s3", "doc_id", "_text", n, bands, rowsPerBand)}, ndup AS (
       |  SELECT DISTINCT a.doc_id FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bucket = b.bucket AND b.doc_id < a.doc_id
       |), s4 AS (
       |  SELECT doc_id, _text FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM ndup)
       |), ptoks AS (
       |  SELECT $toks AS t FROM $table WHERE $probePredSql
       |), probe AS (
       |  SELECT DISTINCT shingle FROM (
       |    SELECT unnest(list_transform(range(1, len(t) - ${n - 2}), i -> $gram)) AS shingle
       |    FROM ptoks WHERE len(t) >= $n)
       |), ctoks AS (
       |  SELECT doc_id, $toksT AS t FROM s4
       |), csh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(t) - ${n - 2}), i -> $gram)) AS shingle
       |    FROM ctoks WHERE len(t) >= $n)
       |), contam AS (
       |  SELECT DISTINCT doc_id FROM csh JOIN probe USING (shingle)
       |), labeled AS (
       |  SELECT lq.doc_id,
       |    CASE WHEN NOT lang_ok THEN 'lang_id'
       |         WHEN qrule <> 'kept' THEN qrule
       |         WHEN x.doc_id IS NOT NULL THEN 'exact_dup'
       |         WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
       |         WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
       |         ELSE 'kept' END AS stage
       |  FROM lq
       |  LEFT JOIN xdup x ON lq.doc_id = x.doc_id
       |  LEFT JOIN ndup nd ON lq.doc_id = nd.doc_id
       |  LEFT JOIN contam ct ON lq.doc_id = ct.doc_id
       |)""".stripMargin
  }

  /** DuckDB mirror of the RAG-indexing composition declared as
    * `pipeline_rag`: the funnel's keep-set becomes the retrieval index;
    * held-out probe docs (bounded by `maxQueryId`) are the queries;
    * exact cosine top-`k` per query over the CURATED corpus only, each
    * neighbor joined back to its document metadata.
    */
  def ragOracleSql(table: String, idCol: String, textCol: String,
                   embTable: String, embIdCol: String, embVecCol: String,
                   corpusPredSql: String, probePredSql: String,
                   queryPredSql: String,
                   minTokens: Int, maxTokens: Int,
                   minMeanLen: Double, maxMeanLen: Double, minTtr: Double,
                   maxQueryId: Long, k: Int,
                   n: Int = 3, bands: Int = 8, rowsPerBand: Int = 4): String =
    s"""WITH ${funnelCtes(table, idCol, textCol, corpusPredSql, probePredSql,
      minTokens, maxTokens, minMeanLen, maxMeanLen, minTtr, n, bands, rowsPerBand)},
       |kept AS (SELECT doc_id FROM labeled WHERE stage = 'kept'),
       |v AS (SELECT $embIdCol AS vec_id, CAST($embVecCol AS DOUBLE[]) AS e FROM $embTable),
       |idx AS (SELECT v.vec_id, v.e FROM v JOIN kept ON v.vec_id = kept.doc_id),
       |q AS (SELECT vec_id AS query_id, e AS qe FROM v
       |      WHERE ($queryPredSql) AND vec_id < $maxQueryId),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    list_sum(list_transform(range(1, len(c.e) + 1), i -> q.qe[i] * c.e[i])) /
       |    (sqrt(list_sum(list_transform(range(1, len(q.qe) + 1), i -> q.qe[i] * q.qe[i]))) *
       |     sqrt(list_sum(list_transform(range(1, len(c.e) + 1), i -> c.e[i] * c.e[i])))) AS cosine
       |  FROM idx c, q WHERE q.query_id <> c.vec_id
       |)
       |SELECT r.query_id, r.neighbor_id, r.cosine, CAST(r.rank AS INTEGER) AS rank,
       |       d.lang, d.n_chars
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored
       |) r JOIN $table d ON r.neighbor_id = d.$idCol
       |WHERE r.rank <= $k""".stripMargin

  /** DuckDB mirror of the pretrain layout composition declared as
    * `pipeline_pretrain`: curated keep-set → per-doc token counts →
    * greedy 512-token sequence packing on the doc_id order (the same
    * packing arithmetic as `t_pack_windows`, applied to the funnel's
    * survivors).
    */
  def pretrainOracleSql(table: String, idCol: String, textCol: String,
                        corpusPredSql: String, probePredSql: String,
                        minTokens: Int, maxTokens: Int,
                        minMeanLen: Double, maxMeanLen: Double, minTtr: Double,
                        budget: Long,
                        n: Int = 3, bands: Int = 8, rowsPerBand: Int = 4): String = {
    val toksT =
      "list_filter(regexp_split_to_array(lower(_text), '[^a-z]+'), x -> x <> '')"
    s"""WITH ${funnelCtes(table, idCol, textCol, corpusPredSql, probePredSql,
      minTokens, maxTokens, minMeanLen, maxMeanLen, minTtr, n, bands, rowsPerBand)},
       |kept AS (SELECT doc_id FROM labeled WHERE stage = 'kept'),
       |kt AS (
       |  SELECT c.doc_id, CAST(COALESCE(len($toksT), 0) AS BIGINT) AS n_tokens
       |  FROM corpus c JOIN kept USING (doc_id)
       |),
       |laid AS (
       |  SELECT doc_id, n_tokens,
       |         sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
       |  FROM kt
       |)
       |SELECT doc_id, n_tokens,
       |       CAST(end_off - n_tokens AS BIGINT) AS start_off,
       |       CAST(floor((end_off - n_tokens) / $budget.0) AS BIGINT) AS first_win,
       |       CAST(CASE WHEN n_tokens > 0 THEN floor((end_off - 1) / $budget.0)
       |            ELSE floor((end_off - n_tokens) / $budget.0) END AS BIGINT) AS last_win
       |FROM laid""".stripMargin
  }
}
