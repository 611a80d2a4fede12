package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The tokenizer BAKE-OFF: one readout comparing the three trained
  * tokenizer families — BPE ([[BpeTrain]], bottom-up merges), unigram-LM
  * ([[UnigramLm]], Viterbi under a piece LM), WordPiece ([[WordPiece]],
  * greedy longest-match) — on the SAME corpus with the standard
  * coverage + fertility pair a tokenizer report publishes:
  *
  *   - '''covered_words / covered_occ''': how many distinct words (and
  *     corpus occurrences) the tokenizer encodes at all. BPE covers every
  *     training word by construction; unigram drops words longer than
  *     `maxWordLen`; WordPiece maps those (and dead walks) to `[UNK]`,
  *     which does not count as coverage.
  *   - '''fertility_micro''': occurrence-weighted mean pieces per word
  *     over the covered set, in fixed-point micros
  *     (`round(Σ wcnt·pieces · 10⁶ / Σ wcnt)`) — the sums are exact
  *     longs, the single division is one correctly-rounded double op, so
  *     the readout is engine-exact (the [[UnigramLm]] micro-nat
  *     discipline applied to a ratio).
  *
  * Scale shape: each tokenizer's per-word table is |distinct words|-
  * sized (never the corpus); the readout is three ≤1-row aggregates
  * unioned — the corpus is scanned once per tokenizer's word-count
  * build, everything downstream is bounded.
  */
object TokenizerEval {

  private def summarize(perWord: DataFrame, name: String,
                        wcnt: String, pieces: String): DataFrame =
    perWord.agg(
      count(lit(1)).as("covered_words"),
      sum(col(wcnt)).as("covered_occ"),
      round(sum(col(wcnt) * col(pieces)).cast("double") * 1000000.0 /
        sum(col(wcnt)).cast("double"), 0).cast("long").as("fertility_micro"))
      .select(lit(name).as("tokenizer"), col("covered_words"),
        col("covered_occ"), col("fertility_micro"))

  /** One row per tokenizer: (tokenizer, covered_words, covered_occ,
    * fertility_micro), trained and evaluated on `docs`.
    */
  def fertility(docs: DataFrame, textCol: String,
                bpeRounds: Int, maxPieceLen: Int, minFreq: Long,
                maxWordLen: Int): DataFrame = {
    val bpe = summarize(
      BpeTrain.vocabSymbolization(docs, textCol, bpeRounds),
      "bpe", "freq", "n_sym")
    val uni = summarize(
      UnigramLm.segment(docs, textCol, maxPieceLen, minFreq, maxWordLen),
      "unigram", "wcnt", "n_pieces")
    val wp = summarize(
      WordPiece.encode(docs, textCol, maxPieceLen, minFreq, maxWordLen)
        .filter(col("seg") =!= "[UNK]"),
      "wordpiece", "wcnt", "n_pieces")
    bpe.unionByName(uni).unionByName(wp)
  }

  /** DuckDB mirror of [[fertility]] — the three oracle chains as
    * subqueries feeding identical aggregate arithmetic.
    */
  def fertilityOracleSql(table: String, textCol: String,
                         bpeRounds: Int, maxPieceLen: Int, minFreq: Long,
                         maxWordLen: Int): String = {
    def agg(name: String, sub: String, wcnt: String, pieces: String,
            pred: String): String =
      s"""SELECT '$name' AS tokenizer,
         |       CAST(count(*) AS BIGINT) AS covered_words,
         |       CAST(SUM($wcnt) AS BIGINT) AS covered_occ,
         |       CAST(round(CAST(SUM($wcnt * $pieces) AS DOUBLE) * 1000000.0 /
         |            CAST(SUM($wcnt) AS DOUBLE)) AS BIGINT) AS fertility_micro
         |FROM (
         |$sub
         |) $pred""".stripMargin
    agg("bpe",
      BpeTrain.vocabSymbolizationOracleSql(table, textCol, bpeRounds),
      "freq", "n_sym", "") +
      "\nUNION ALL\n" +
      agg("unigram",
        UnigramLm.segmentOracleSql(table, textCol, maxPieceLen, minFreq, maxWordLen),
        "wcnt", "n_pieces", "") +
      "\nUNION ALL\n" +
      agg("wordpiece",
        WordPiece.encodeOracleSql(table, textCol, maxPieceLen, minFreq, maxWordLen),
        "wcnt", "n_pieces", "WHERE seg <> '[UNK]'")
  }
}
