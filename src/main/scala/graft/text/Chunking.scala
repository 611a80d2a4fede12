package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the context-window preparation
  * step of an LLM training/RAG pipeline: each document becomes windows of
  * `win` whitespace tokens taken every `stride` tokens (stride < win ⇒
  * consecutive chunks overlap by `win - stride`, preserving context
  * across cut points; the tail chunk is shorter rather than dropped, so
  * no token is lost).
  *
  * Beyond-reference extension (the reference never chunks its notes;
  * SURVEY §7.6 extension surface): entirely executor-side — tokenize,
  * `sequence` over window starts, `explode`, `slice` — zero shuffles,
  * zero UDFs, and the per-row fan-out is `⌈n/stride⌉`, bounded by each
  * document's own length. At 100 TB the operator is a linear map; the
  * only scale knob is output size (≈ win/stride × input tokens).
  */
object Chunking {

  /** @return (doc_id, chunk_idx, start_tok, n_tokens, chunk_text) —
    *         one row per window; empty/whitespace-only docs emit none.
    */
  def chunkOverlap(docs: DataFrame, idCol: String, textCol: String,
                   win: Int, stride: Int): DataFrame = {
    require(win > 0 && stride > 0 && stride <= win,
      s"need 0 < stride <= win, got win=$win stride=$stride")
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    docs
      .select(col(idCol).as("doc_id"), toks.as("_toks"))
      .withColumn("_n", size(col("_toks")))
      .filter(col("_n") > 0)
      .withColumn("start_tok",
        explode(sequence(lit(0), col("_n") - 1, lit(stride))))
      .select(
        col("doc_id"),
        (col("start_tok") / stride).cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        slice(col("_toks"), col("start_tok") + 1, lit(win)).as("_chunk"))
      .select(
        col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("_chunk")).cast("long").as("n_tokens"),
        array_join(col("_chunk"), " ").as("chunk_text"))
  }

  /** DuckDB mirror of [[chunkOverlap]]. */
  def chunkOverlapOracleSql(table: String, idCol: String, textCol: String,
                            win: Int, stride: Int): String =
    s"""WITH t AS (
       |  SELECT $idCol AS doc_id,
       |         list_filter(regexp_split_to_array($textCol, '\\s+'), x -> x <> '') AS toks
       |  FROM $table
       |), c AS (
       |  SELECT doc_id, toks, unnest(range(0, len(toks), $stride)) AS start_tok
       |  FROM t WHERE len(toks) > 0
       |)
       |SELECT doc_id,
       |       CAST(start_tok // $stride AS BIGINT) AS chunk_idx,
       |       CAST(start_tok AS BIGINT) AS start_tok,
       |       CAST(len(list_slice(toks, start_tok + 1, start_tok + $win)) AS BIGINT) AS n_tokens,
       |       array_to_string(list_slice(toks, start_tok + 1, start_tok + $win), ' ') AS chunk_text
       |FROM c""".stripMargin
}
