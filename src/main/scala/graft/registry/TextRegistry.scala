package graft
package registry

import graft.core.Tables
import graft.dedup.Dedup
import graft.functions.VectorOps
import graft.ops.{CohortOps, Recodes}
import graft.sim.{Quantized, Similarity}
import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** text analysis (tokenize, quality, tf-idf, chunking, fingerprints) — one slice of the driver registry.
  *
  * Split out of Shared.scala in r12 (maintainability: the single file
  * had reached 8.7k lines). PURE CODE MOTION: entry bodies and oracle SQL
  * are byte-identical to the pre-split registry; SparkEntry composes the
  * slices back into the same `queries`/`oracleSql` maps.
  */
private[graft] object TextRegistry {
  import Shared._

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "t_token_stats" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.stopwordCount(col("text")).as("n_stop"),
        TextOps.alphaRatio(col("text")).as("alpha_ratio"))),

    // BPE-ish subword-count estimate (alpha runs contribute ceil(len/4)
    // pieces, digit runs 1 each) — the cheap deterministic token-budget
    // proxy for an LLM-data pipeline, exactly mirrored in SQL
    "t_token_bpe" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"), TextOps.tokenCountBpeIsh(col("text")).as("n_bpe"))),

    // text quality components (exact integer-ratio arithmetic)
    "t_quality" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        TextOps.alphaRatio(col("text")).as("alpha_ratio"),
        TextOps.stopwordRatio(col("text")).as("stop_ratio"),
        TextOps.meanTokenLen(col("text")).as("mean_tok_len"))),

    "t_lang_id" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("lang").as("actual_lang"), TextOps.langId(col("text")).as("pred_lang"))
        .groupBy("actual_lang", "pred_lang").agg(count(lit(1)).as("cnt"))),

    "t_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"), TextOps.fingerprintMd5(col("text")).as("fingerprint"))),

    "t_rolling_hash" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"), TextOps.rollingHash(col("text")).as("rhash"))),

    // Gopher/C4-style repetition quality signal: fraction of word 3-grams
    // that are repeats within the document. Tokens materialize behind one
    // projection boundary (the shingle transform references the token
    // attribute, not the regex subtree — see TextOps.shingles PERF note).
    "t_repetition" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(
          col("doc_id"),
          when(size(col("toks")) < 3, lit(0L)).otherwise(size(col("toks")) - 2).cast("bigint").as("n_shingles"),
          size(TextOps.shinglesFromTokens(col("toks"), 3)).cast("bigint").as("n_distinct"))
        .withColumn("dup_frac",
          when(col("n_shingles") === 0, lit(0.0))
            .otherwise(round(lit(1.0) - col("n_distinct").cast("double") / col("n_shingles"), 6)))),
          // shinglesFromTokens is already distinct — one definition shared
          // with the Jaccard/MinHash dedup path

    // per-doc n-gram novelty: the fraction of a doc's distinct 3-shingles
    // never seen in any LOWER-id doc — the dataset-curation novelty
    // profile (a low-novelty doc is boilerplate/near-dup even when no
    // single pair crosses a dedup threshold). One explode → hash-agg for
    // the global first-occurrence table, one equi-join on the shingle
    "t_ngram_novelty" -> ((s, d) => {
      val sh = t(s, d, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("_toks"))
        .select(col("doc_id"),
          explode(TextOps.shinglesFromTokens(col("_toks"), 3)).as("shingle"))
      val firstDoc = sh.groupBy("shingle").agg(min("doc_id").as("first_doc"))
      sh.join(firstDoc, "shingle")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
    }),

    // fixed-size token-window chunking — the "split documents into model
    // context windows" step of an LLM data pipeline. Emits one row per
    // 40-token chunk with its token span and an md5 of the chunk text so
    // the chunk CONTENT (not just the arithmetic) is hash-checked.
    "t_chunk_tokens" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"), col("toks"),
          posexplode(sequence(lit(0), ceil(size(col("toks")) / lit(40.0)).cast("int") - 1)))
        .select(
          col("doc_id"),
          col("col").as("chunk_idx"),
          (col("col") * 40).cast("bigint").as("tok_start"),
          least(size(col("toks")).cast("bigint"), (col("col") + 1) * lit(40L)).as("tok_end"),
          md5(concat_ws(" ", slice(col("toks"), col("col") * 40 + 1,
            lit(40)))).as("chunk_md5"))),

    // token-budget sequence packing: documents laid end-to-end on ONE
    // global token axis (distributed two-pass cumsum — no single-partition
    // window) and chopped into 512-token context windows; each doc reports
    // its global start offset and the [first, last] window span it lands
    // in — the packed-pretraining shard layout.
    "t_pack_windows" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), TextOps.tokenCount(col("text")).cast("bigint").as("n_tokens"))
      graft.ops.SequencePacking.packWindows(
        docs, col("n_tokens"), budget = 512L, col("doc_id"))
        .df.select("doc_id", "n_tokens", "start_off", "first_win", "last_win")
    }),

    // OVERLAPPING chunks (40-token window, 20-token stride — each token in
    // ≤2 chunks): the retrieval-context variant where boundary-spanning
    // content must appear whole in at least one chunk. Starts at 0, 20, …
    // while start < n_tokens; trailing chunks may be sub-window.
    "t_chunk_overlap" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"), col("toks"),
          posexplode(sequence(lit(0), ceil(size(col("toks")) / lit(20.0)).cast("int") - 1)))
        .select(
          col("doc_id"),
          col("col").as("chunk_idx"),
          (col("col") * 20).cast("bigint").as("tok_start"),
          least(size(col("toks")).cast("bigint"), col("col") * 20 + lit(40L)).as("tok_end"),
          md5(concat_ws(" ", slice(col("toks"), col("col") * 20 + 1,
            lit(40)))).as("chunk_md5"))),

    // E13/E16 standalone: the newline-scrub + punct/digit-strip normalize
    // step, oracled directly (regexp_replace is in the dialect intersection)
    "t_normalize" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"), TextOps.normalize(col("text")).as("norm_text"))),

    // E16's lemmatize step end-to-end through the native codegen'd
    // Lemmatize expression, hash-checked: the oracle renders the SAME
    // suffix/irregular rule engine into generated DuckDB SQL
    // (Lemmatizer.oracleSql), closing the last spec-only E row
    "t_lemmas" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        array_join(
          graft.functions.GraftFunctions.lemmatize_all(TextOps.tokens(col("text"))),
          " ").as("lemmas"))),
  )

  val oracles: Seq[(String, String)] = Seq(
    "t_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, text,
        |         list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS t
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |    CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text)
        |  END AS alpha_ratio,
        |  CASE WHEN len(t) = 0 THEN 0.0 ELSE
        |    CAST(len(list_filter(t, x -> list_contains(['a','an','the','and','or','of','to','in','on','at','for','is','are','was','were','be','been','it','its','this','that','with','as','by','from','not','no','but','if','then','so'], x))) AS DOUBLE) / len(t)
        |  END AS stop_ratio,
        |  CASE WHEN len(t) = 0 THEN 0.0 ELSE
        |    CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t)
        |  END AS mean_tok_len
        |FROM toks""".stripMargin,

    "t_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')) AS INTEGER) AS n_tokens,
        |  CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
        |       x -> list_contains(['a','an','the','and','or','of','to','in','on','at','for','is','are','was','were','be','been','it','its','this','that','with','as','by','from','not','no','but','if','then','so'], x))) AS INTEGER) AS n_stop,
        |  CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |    CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text)
        |  END AS alpha_ratio
        |FROM documents""".stripMargin,

    "t_pack_windows" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n_tokens,
        |         sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
        |  FROM tk
        |)
        |SELECT doc_id, n_tokens,
        |       CAST(end_off - n_tokens AS BIGINT) AS start_off,
        |       CAST(floor((end_off - n_tokens) / 512.0) AS BIGINT) AS first_win,
        |       CAST(CASE WHEN n_tokens > 0 THEN floor((end_off - 1) / 512.0)
        |            ELSE floor((end_off - n_tokens) / 512.0) END AS BIGINT) AS last_win
        |FROM c""".stripMargin,

    "t_lang_id" ->
      """WITH scored AS (
        |  SELECT lang AS actual_lang,
        |    regexp_matches(text, '[\x{4e00}-\x{9fff}]') AS is_cjk,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS toks
        |  FROM documents
        |), h AS (
        |  SELECT actual_lang, is_cjk,
        |    len(list_filter(toks, x -> list_contains(['the','and','of','is','with'], x))) AS en,
        |    len(list_filter(toks, x -> list_contains(['el','la','de','que','los'], x))) AS es,
        |    len(list_filter(toks, x -> list_contains(['le','la','de','et','les'], x))) AS fr,
        |    len(list_filter(toks, x -> list_contains(['der','die','und','das','ist'], x))) AS de
        |  FROM scored
        |)
        |SELECT actual_lang,
        |  CASE WHEN is_cjk THEN 'zh'
        |       WHEN en >= es AND en >= fr AND en >= de THEN 'en'
        |       WHEN es >= fr AND es >= de THEN 'es'
        |       WHEN fr >= de THEN 'fr'
        |       ELSE 'de' END AS pred_lang,
        |  count(*) AS cnt
        |FROM h GROUP BY 1, 2""".stripMargin,

    "t_fingerprint" ->
      """SELECT doc_id,
        |  CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')) = 0
        |       THEN md5(lower(text))
        |       ELSE md5(array_to_string(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> ''), ' '))
        |  END AS fingerprint
        |FROM documents""".stripMargin,

    "t_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[\r\n]', ' ', 'g'), '[^a-z ]', ' ', 'g')) AS norm_text
        |FROM documents""".stripMargin,

    "t_ngram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
        |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        |    FROM toks WHERE len(t) >= 3
        |  )
        |), fd AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY 1)
        |SELECT sh.doc_id, count(*) AS n_shingles,
        |       CAST(SUM(CASE WHEN fd.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |FROM sh JOIN fd USING (shingle)
        |GROUP BY 1""".stripMargin,

    "t_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(t) < 3 THEN 0 ELSE len(t) - 2 END AS n_shingles,
        |         CASE WHEN len(t) < 3 THEN 0
        |              ELSE len(list_distinct(list_transform(range(1, len(t) - 1),
        |                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) END AS n_distinct
        |  FROM toks
        |)
        |SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
        |       CAST(n_distinct AS BIGINT) AS n_distinct,
        |       CASE WHEN n_shingles = 0 THEN 0.0
        |            ELSE round(1.0 - CAST(n_distinct AS DOUBLE) / n_shingles, 6) END AS dup_frac
        |FROM sh""".stripMargin,

    "t_chunk_tokens" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS t
        |  FROM documents
        |), expl AS (
        |  SELECT doc_id, t,
        |         unnest(range(0, CAST(ceil(len(t) / 40.0) AS BIGINT))) AS i
        |  FROM toks WHERE len(t) > 0
        |)
        |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
        |       CAST(i * 40 AS BIGINT) AS tok_start,
        |       LEAST(CAST(len(t) AS BIGINT), (i + 1) * 40) AS tok_end,
        |       md5(array_to_string(list_slice(t, i * 40 + 1, (i + 1) * 40), ' ')) AS chunk_md5
        |FROM expl""".stripMargin,

    "t_chunk_overlap" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS t
        |  FROM documents
        |), expl AS (
        |  SELECT doc_id, t,
        |         unnest(range(0, CAST(ceil(len(t) / 20.0) AS BIGINT))) AS i
        |  FROM toks WHERE len(t) > 0
        |)
        |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
        |       CAST(i * 20 AS BIGINT) AS tok_start,
        |       LEAST(CAST(len(t) AS BIGINT), i * 20 + 40) AS tok_end,
        |       md5(array_to_string(list_slice(t, i * 20 + 1, i * 20 + 40), ' ')) AS chunk_md5
        |FROM expl""".stripMargin,

    "t_rolling_hash" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(17 AS BIGINT),
        |    list_transform(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> ''),
        |      t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT))),
        |    (acc, h) -> (acc * 31 + h) % 2147483647) AS rhash
        |FROM documents""".stripMargin,

    "t_token_bpe" ->
      """SELECT doc_id,
        |  CAST(COALESCE(list_sum(list_transform(
        |         list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> ''),
        |         t -> CAST(CEIL(length(t) / 4.0) AS BIGINT))), 0)
        |       + len(list_filter(regexp_split_to_array(text, '[^0-9]+'), x -> x <> '')) AS BIGINT) AS n_bpe
        |FROM documents""".stripMargin,

    "t_lemmas" ->
      graft.text.Lemmatizer.oracleSql("documents", "doc_id", "text"),
  )
}
