package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece subword tokenizer (Schuster & Nakajima 2012; the BERT
  * tokenizer), completing the tokenizer family next to [[BpeTrain]]
  * (bottom-up merges) and [[UnigramLm]] (top-down Viterbi): WordPiece is
  * the GREEDY longest-match-first segmenter over a positional vocab —
  * word-initial pieces are stored bare, word-internal pieces carry the
  * `##` continuation prefix, and encoding walks left-to-right taking the
  * longest vocab piece at each position. A word that dies mid-walk (no
  * piece matches at some position) or exceeds `maxWordLen` chars maps to
  * the single `[UNK]` token — BERT's `max_input_chars_per_word` rule.
  *
  *   - '''vocab''': positional substring counts of the corpus words,
  *     count-weighted by word frequency: for each length `1..maxPieceLen`
  *     ONE initial form per word (`substr(w,1,l)`) and the `##`-prefixed
  *     continuation forms at positions `2..`. Single-char cores always
  *     survive (both forms — the segmentability guarantee for training
  *     chars); longer pieces need `minFreq` weighted occurrences.
  *
  *   - '''encode''': deterministic greedy walk — unlike the unigram
  *     Viterbi there is no tiebreak to declare: at each position at most
  *     one piece per length matches, and greedy takes the longest.
  *
  * Scale shape: vocab building is explode → ONE hash-agg over the
  * |distinct words| frame (never the corpus); the trained vocab is a
  * bounded model artifact that broadcasts; encoding is one shuffle-free
  * typed pass over distinct target words — the documented typed-kernel
  * exception (see [[UnigramLm.segmentApply]]): a level-per-DataFrame
  * greedy walk would re-inline each level's lineage ≤`maxPieceLen`× per
  * successor into exponentially many subtree copies. The DuckDB oracle
  * replays the SAME walk as `maxWordLen` unrolled MATERIALIZED CTE
  * levels (one level per emitted piece), so every greedy choice is
  * cross-engine-checked.
  */
object WordPiece {

  /** Positional piece counts. Output: (piece, cnt) — `##`-prefixed rows
    * are continuation pieces; single-char cores bypass `minFreq`.
    */
  def vocab(docs: DataFrame, textCol: String,
            maxPieceLen: Int, minFreq: Long): DataFrame = {
    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
    // initial form: exactly one per (word, l) — the prefix
    val initPerL: Seq[Column] = (1 to maxPieceLen).map { l =>
      when(length(col("word")) >= l, array(col("word").substr(1, l)))
        .otherwise(array())
    }
    // continuation forms: positions 2..len-l+1, '##'-prefixed; the
    // when-guard matters — Spark's sequence(2, 1) DESCENDS, not empties
    val contPerL: Seq[Column] = (1 to maxPieceLen).map { l =>
      when(length(col("word")) >= l + 1,
        transform(sequence(lit(2), length(col("word")) - lit(l - 1)),
          i => concat(lit("##"), col("word").substr(i, lit(l)))))
        .otherwise(array())
    }
    val coreLen = when(col("piece").startsWith("##"),
      length(col("piece")) - 2).otherwise(length(col("piece")))
    words
      .select(explode(flatten(array(initPerL ++ contPerL: _*))).as("piece"),
        col("wcnt"))
      .groupBy("piece").agg(sum("wcnt").as("cnt"))
      .filter(coreLen === 1 || col("cnt") >= minFreq)
  }

  /** Greedy longest-match encoding of every distinct corpus word.
    * Output: (word, wcnt, n_pieces, seg) with `seg` = pieces joined by
    * '|' (continuations keep their `##`), or the single `[UNK]` with
    * n_pieces = 1 for dead/over-long words.
    */
  def encode(docs: DataFrame, textCol: String,
             maxPieceLen: Int, minFreq: Long, maxWordLen: Int): DataFrame =
    encodeApply(docs, textCol, docs, textCol, maxPieceLen, minFreq, maxWordLen)

  /** Deploy-time WordPiece encode: vocab trains on `vocabDocs`, the walk
    * runs over a DIFFERENT corpus's distinct words — the inference path.
    * Target words with characters the training corpus never produced die
    * at that position and surface as `[UNK]` (unlike [[UnigramLm]]'s
    * drop-out semantics, BERT keeps the word as one unknown token).
    */
  def encodeApply(vocabDocs: DataFrame, vocabTextCol: String,
                  target: DataFrame, targetTextCol: String,
                  maxPieceLen: Int, minFreq: Long, maxWordLen: Int): DataFrame = {
    val spark = vocabDocs.sparkSession
    import spark.implicits._
    // bounded model artifact: collect + broadcast, the BpeTrain contract
    val model: Set[String] =
      vocab(vocabDocs, vocabTextCol, maxPieceLen, minFreq)
        .select("piece").as[String].collect().toSet
    val bc = spark.sparkContext.broadcast(model)
    val L = maxPieceLen
    val words = target
      .select(explode(TextOps.tokens(col(targetTextCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
    words.as[(String, Long)]
      .map { case (w, wcnt) =>
        val vs = bc.value
        val n = w.length
        if (n > maxWordLen) (w, wcnt, 1, "[UNK]")
        else {
          val sb = new StringBuilder
          var pos = 0
          var np = 0
          var dead = false
          while (pos < n && !dead) {
            var l = math.min(L, n - pos)
            var found = 0
            while (l >= 1 && found == 0) {
              val cand =
                (if (pos == 0) "" else "##") + w.substring(pos, pos + l)
              if (vs.contains(cand)) found = l else l -= 1
            }
            if (found == 0) dead = true
            else {
              if (sb.nonEmpty) sb.append('|')
              if (pos > 0) sb.append("##")
              sb.append(w.substring(pos, pos + found))
              np += 1
              pos += found
            }
          }
          if (dead) (w, wcnt, 1, "[UNK]") else (w, wcnt, np, sb.toString)
        }
      }
      .toDF("word", "wcnt", "n_pieces", "seg")
  }

  private def toksSql(textCol: String): String =
    s"list_filter(regexp_split_to_array(lower($textCol), '[^a-z]+'), x -> x <> '')"

  private def vocabCtes(table: String, textCol: String,
                        maxPieceLen: Int, minFreq: Long): String = {
    val initSelects = (1 to maxPieceLen).map { l =>
      s"SELECT substr(word, 1, $l) AS piece, wcnt FROM words WHERE strlen(word) >= $l"
    }
    val contSelects = (1 to maxPieceLen).map { l =>
      s"SELECT unnest(list_transform(range(2, strlen(word) - ${l - 2}), i -> '##' || substr(word, i, $l))) AS piece, wcnt FROM words WHERE strlen(word) >= ${l + 1}"
    }
    val allSelects = (initSelects ++ contSelects).mkString("\n    UNION ALL ")
    s"""toks AS MATERIALIZED (
       |  SELECT unnest(${toksSql(textCol)}) AS word FROM $table
       |), words AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS wcnt FROM toks GROUP BY 1
       |), rawpieces AS (
       |  SELECT piece, CAST(SUM(wcnt) AS BIGINT) AS cnt FROM (
       |    $allSelects
       |  ) GROUP BY piece
       |), wvocab AS MATERIALIZED (
       |  SELECT piece, cnt FROM rawpieces
       |  WHERE strlen(CASE WHEN piece LIKE '##%' THEN substr(piece, 3) ELSE piece END) = 1
       |     OR cnt >= $minFreq
       |)""".stripMargin
  }

  /** DuckDB mirror of [[vocab]]. */
  def vocabOracleSql(table: String, textCol: String,
                     maxPieceLen: Int, minFreq: Long): String =
    s"""WITH ${vocabCtes(table, textCol, maxPieceLen, minFreq)}
       |SELECT piece, cnt FROM wvocab""".stripMargin

  /** DuckDB mirror of [[encode]]. */
  def encodeOracleSql(table: String, textCol: String,
                      maxPieceLen: Int, minFreq: Long, maxWordLen: Int): String =
    encodeApplyOracleSql(table, textCol, table, textCol,
      maxPieceLen, minFreq, maxWordLen)

  /** DuckDB mirror of [[encodeApply]] (and, with target = source, of
    * [[encode]]): the greedy walk unrolled to `maxWordLen` MATERIALIZED
    * CTE levels — level k holds every word's position after k emitted
    * pieces; each level joins the frontier to the vocab per piece length
    * (an equi-join: the `##`-prefixed CASE key is computable from the
    * frontier row alone) and keeps the LONGEST match via
    * `row_number() OVER (PARTITION BY word ORDER BY plen DESC)`. Words
    * whose frontier dies, and words longer than `maxWordLen`, fall out
    * of `final` and COALESCE to the `[UNK]` row.
    */
  def encodeApplyOracleSql(table: String, textCol: String,
                           targetTable: String, targetTextCol: String,
                           maxPieceLen: Int, minFreq: Long, maxWordLen: Int): String = {
    val steps = (1 to maxWordLen).map { k =>
      val perLen = (1 to maxPieceLen).map { l =>
        s"SELECT b.word, b.pos + $l AS pos, CASE WHEN b.seg = '' THEN v.piece ELSE b.seg || '|' || v.piece END AS seg, b.np + 1 AS np, $l AS plen " +
          s"FROM f${k - 1} b JOIN wvocab v ON v.piece = CASE WHEN b.pos = 0 THEN substr(b.word, 1, $l) ELSE '##' || substr(b.word, b.pos + 1, $l) END " +
          s"WHERE b.pos + $l <= strlen(b.word)"
      }.mkString("\n      UNION ALL ")
      s"""f$k AS MATERIALIZED (
         |  SELECT word, pos, seg, np FROM (
         |    SELECT word, pos, seg, np,
         |      row_number() OVER (PARTITION BY word ORDER BY plen DESC) AS rn
         |    FROM (
         |      $perLen
         |    )
         |  ) WHERE rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    val finals = (1 to maxWordLen)
      .map(k => s"SELECT word, np, seg FROM f$k WHERE pos = strlen(word)")
      .mkString("\n  UNION ALL ")
    s"""WITH ${vocabCtes(table, textCol, maxPieceLen, minFreq)},
       |twords AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS wcnt FROM (
       |    SELECT unnest(${toksSql(targetTextCol)}) AS word FROM $targetTable
       |  ) GROUP BY 1
       |),
       |f0 AS MATERIALIZED (
       |  SELECT word, 0 AS pos, '' AS seg, 0 AS np
       |  FROM twords WHERE strlen(word) <= $maxWordLen
       |),
       |$steps,
       |final AS (
       |  $finals
       |)
       |SELECT w.word, w.wcnt,
       |       COALESCE(f.np, 1) AS n_pieces,
       |       COALESCE(f.seg, '[UNK]') AS seg
       |FROM twords w LEFT JOIN final f USING (word)""".stripMargin
  }
}
