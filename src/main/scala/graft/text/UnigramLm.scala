package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (SentencePiece's second algorithm —
  * Kudo 2018 "Subword Regularization"), in a fully deterministic,
  * cross-engine-exact form that completes the tokenizer family next to
  * [[BpeTrain]] (BPE = bottom-up merges; unigram = top-down segmentation
  * under a piece language model):
  *
  *   - '''vocab''': every substring of length 1..`maxPieceLen` of the
  *     corpus words, count-weighted by word frequency; pieces shorter
  *     than 2 chars always survive (segmentability guarantee), longer
  *     pieces need `minFreq` occurrences. Piece log-probabilities are
  *     fixed-point integers: `vscore = round((ln cnt − ln total)·10⁶)`
  *     — the micro-nat trick that makes Viterbi argmax comparisons exact
  *     integer arithmetic on every engine (the same round-the-only-
  *     transcendental pattern as DriftOps' psi terms).
  *
  *   - '''segment''': per distinct word, the max-likelihood segmentation
  *     under the unigram model via Viterbi DP
  *     (`best[i] = max over l: best[i−l] + vscore(word[i−l..i])`),
  *     tiebreak: highest score, then lexicographically SMALLEST
  *     segmentation string — a total, engine-portable order.
  *
  * Scale shape: vocab building is explode → ONE hash-agg (substring
  * expansion is pure codegen'd HOFs over the |distinct words| frame, not
  * the corpus); the trained vocab is a bounded model artifact (readout
  * size = vocab size, exactly like [[BpeTrain]]'s merge list) that
  * BROADCASTS to executors; segmentation is then one shuffle-free typed
  * pass over distinct words — the documented typed-kernel exception
  * (see [[graft.dedup.Dedup.minhashBandsPerRow]]): a 12-level DataFrame
  * DP would re-inline each level's lineage up to 4× per successor
  * (Catalyst has no cross-reference plan CSE), compiling tetranacci-many
  * subtree copies. The DuckDB oracle runs the SAME DP as an unrolled
  * MATERIALIZED-CTE chain, so the kernel's every argmax is still
  * cross-engine-checked.
  */
object UnigramLm {

  /** All (piece, cnt) substring counts + fixed-point log-prob scores.
    * Output: (piece, cnt, vscore) — the trained model table.
    */
  def vocab(docs: DataFrame, textCol: String,
            maxPieceLen: Int, minFreq: Long): DataFrame = {
    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
    // per-length substring expansion: for l, positions 1..len-l+1; the
    // when-guard matters — Spark's sequence(1, 0) DESCENDS, not empties
    val perL = (1 to maxPieceLen).map { l =>
      when(length(col("word")) >= l,
        transform(sequence(lit(1), length(col("word")) - lit(l - 1)),
          i => col("word").substr(i, lit(l))))
        .otherwise(array())
    }
    val pieces = words
      .select(explode(flatten(array(perL: _*))).as("piece"), col("wcnt"))
      .groupBy("piece").agg(sum("wcnt").as("cnt"))
      .filter(length(col("piece")) === 1 || col("cnt") >= minFreq)
    // the grand total is a partial-aggregated global agg crossJoined back
    // as a broadcast 1-row frame — NOT a Window.partitionBy() pass, which
    // would funnel the whole vocab frame (10⁸⁺ substrings on a 100 TB
    // corpus) through one task. Both consumers of `pieces` share the same
    // hash(piece) exchange, so ReusedExchange dedups the corpus
    // explode+agg: the data is still scanned once (asserted in
    // UnigramLmSpec's plan test).
    val total = pieces.agg(sum("cnt").as("_total"))
    pieces
      .crossJoin(broadcast(total))
      .select(col("piece"), col("cnt"),
        round((log(col("cnt")) - log(col("_total"))) * lit(1000000.0), 0)
          .cast("long").as("vscore"))
  }

  /** Viterbi max-likelihood segmentation of every distinct corpus word
    * (length ≤ `maxWordLen`). Output:
    * (word, wcnt, n_pieces, score_micro, seg) with `seg` = pieces joined
    * by '|'.
    */
  def segment(docs: DataFrame, textCol: String,
              maxPieceLen: Int, minFreq: Long, maxWordLen: Int): DataFrame =
    segmentApply(docs, textCol, docs, textCol, maxPieceLen, minFreq, maxWordLen)

  /** Deploy-time unigram encode: the model trains on `vocabDocs` and
    * segments the distinct words of a DIFFERENT corpus — the inference
    * path ([[BpeTrain]]'s `t_bpe_apply` counterpart). A target word that
    * cannot be covered by trained pieces (a character the training corpus
    * never produced) is DROPPED, mirroring the oracle DP where no path
    * reaches its final position.
    */
  def segmentApply(vocabDocs: DataFrame, vocabTextCol: String,
                   target: DataFrame, targetTextCol: String,
                   maxPieceLen: Int, minFreq: Long, maxWordLen: Int): DataFrame = {
    // the trained model is a bounded artifact: collect + broadcast, the
    // same contract as BpeTrain's merge-list readout
    val model: Map[String, Long] = {
      import vocabDocs.sparkSession.implicits._
      vocab(vocabDocs, vocabTextCol, maxPieceLen, minFreq)
        .select("piece", "vscore").as[(String, Long)].collect().toMap
    }
    val words = target
      .select(explode(TextOps.tokens(col(targetTextCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
      .filter(length(col("word")) <= maxWordLen)
    viterbi(words, model, maxPieceLen)
  }

  /** The Viterbi kernel under an EXPLICIT broadcast model — shared by
    * [[segmentApply]] and the hard-EM round ([[emSegment]]), which needs
    * to re-run it under re-estimated scores.
    */
  private def viterbi(words: DataFrame, model: Map[String, Long],
                      maxPieceLen: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val L = maxPieceLen
    words.as[(String, Long)]
      .flatMap { case (w, wcnt) =>
        val m = bc.value
        val n = w.length
        // best(i) = (score, seg) for the first i chars; tiebreak per step:
        // highest score, then lexicographically smallest seg — identical
        // to the oracle's ORDER BY score DESC, seg ASC
        val score = Array.fill(n + 1)(Long.MinValue)
        val seg = Array.fill(n + 1)("")
        val np = Array.fill(n + 1)(0)
        score(0) = 0L
        var i = 1
        while (i <= n) {
          var l = 1
          while (l <= L && l <= i) {
            val j = i - l
            if (score(j) != Long.MinValue) {
              m.get(w.substring(j, i)).foreach { vs =>
                val cand = score(j) + vs
                val candSeg =
                  if (seg(j).isEmpty) w.substring(j, i)
                  else seg(j) + "|" + w.substring(j, i)
                if (cand > score(i) ||
                  (cand == score(i) && candSeg < seg(i))) {
                  score(i) = cand; seg(i) = candSeg; np(i) = np(j) + 1
                }
              }
            }
            l += 1
          }
          i += 1
        }
        if (score(n) == Long.MinValue) None // uncoverable word: no DP path
        else Some((w, wcnt, np(n), score(n), seg(n)))
      }
      .toDF("word", "wcnt", "n_pieces", "score_micro", "seg")
  }

  /** ONE hard-EM (Viterbi-EM) re-estimation round — the step
    * SentencePiece's actual training loop iterates (Kudo 2018 §3.2, with
    * the E-step hardened to the Viterbi path, a standard variant):
    * segment every word under the count-initialized model, re-estimate
    * piece probabilities from the SEGMENTATIONS (occurrence-weighted
    * hard counts — pieces the Viterbi never uses fall out of the model,
    * the EM form of vocabulary pruning), then re-segment under the
    * re-estimated scores. Every word stays coverable by construction:
    * its own round-1 pieces are in the round-2 model.
    *
    * Output: the round-2 segmentation (word, wcnt, n_pieces,
    * score_micro, seg). Scale shape: two broadcast-model typed passes
    * over the |distinct words| frame + one piece-count hash-agg whose
    * readout is the (bounded) model itself.
    */
  def emSegment(docs: DataFrame, textCol: String,
                maxPieceLen: Int, minFreq: Long, maxWordLen: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val m0: Map[String, Long] =
      vocab(docs, textCol, maxPieceLen, minFreq)
        .select("piece", "vscore").as[(String, Long)].collect().toMap
    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
      .filter(length(col("word")) <= maxWordLen)
    val s0 = viterbi(words, m0, maxPieceLen)
    // the hard counts are the bounded model artifact itself — collect
    // them (exactly what the next line did with the scores) and do the
    // total + log re-scoring on the driver. This kills the former
    // Window.partitionBy() single-task pass AND avoids re-executing the
    // typed Viterbi kernel lineage twice (typed kernels defeat plan-level
    // exchange reuse — the pipeline_rag lesson). Rounding replicates
    // Spark's Round-on-double exactly: BigDecimal.valueOf (shortest-
    // decimal) + HALF_UP, and Math.log is the same java.lang.Math.log
    // Spark's log expression evaluates.
    val counts: Array[(String, Long)] = s0
      .select(col("wcnt"), explode(split(col("seg"), "\\|")).as("piece"))
      .groupBy("piece").agg(sum("wcnt").as("cnt"))
      .as[(String, Long)].collect()
    val total = counts.map(_._2).sum
    val m1: Map[String, Long] = counts.map { case (p, c) =>
      p -> java.math.BigDecimal.valueOf(
        (math.log(c.toDouble) - math.log(total.toDouble)) * 1000000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    }.toMap
    viterbi(words, m1, maxPieceLen)
  }

  private def toksSql(textCol: String): String =
    s"list_filter(regexp_split_to_array(lower($textCol), '[^a-z]+'), x -> x <> '')"

  private def vocabCtes(table: String, textCol: String,
                        maxPieceLen: Int, minFreq: Long): String = {
    val pieceSelects = (1 to maxPieceLen).map { l =>
      s"SELECT unnest(list_transform(range(1, strlen(word) - ${l - 2}), i -> substr(word, i, $l))) AS piece, wcnt FROM words WHERE strlen(word) >= $l"
    }.mkString("\n    UNION ALL ")
    s"""toks AS MATERIALIZED (
       |  SELECT unnest(${toksSql(textCol)}) AS word FROM $table
       |), words AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS wcnt FROM toks GROUP BY 1
       |), pieces AS (
       |  SELECT piece, CAST(SUM(wcnt) AS BIGINT) AS cnt FROM (
       |    $pieceSelects
       |  ) GROUP BY piece
       |), vocab AS (
       |  SELECT piece, cnt FROM pieces WHERE strlen(piece) = 1 OR cnt >= $minFreq
       |), vtot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
       |scored AS MATERIALIZED (
       |  SELECT piece, cnt, CAST(round((ln(cnt) - ln(total)) * 1000000) AS BIGINT) AS vscore
       |  FROM vocab, vtot
       |)""".stripMargin
  }

  /** DuckDB mirror of [[vocab]]. */
  def vocabOracleSql(table: String, textCol: String,
                     maxPieceLen: Int, minFreq: Long): String =
    s"""WITH ${vocabCtes(table, textCol, maxPieceLen, minFreq)}
       |SELECT piece, cnt, vscore FROM scored""".stripMargin

  /** DuckDB mirror of [[segment]]: the Viterbi DP unrolled to
    * `maxWordLen` MATERIALIZED CTE levels (materialization is load-
    * bearing — inlined, each level would re-expand its ≤`maxPieceLen`
    * predecessors into tetranacci-many subtree copies), per-step argbest
    * via `ORDER BY score DESC, seg ASC`.
    */
  def segmentOracleSql(table: String, textCol: String,
                       maxPieceLen: Int, minFreq: Long, maxWordLen: Int): String =
    segmentApplyOracleSql(table, textCol, table, textCol,
      maxPieceLen, minFreq, maxWordLen)

  /** DuckDB mirror of [[segmentApply]] (and, with target = source, of
    * [[segment]]): the Viterbi DP unrolled to `maxWordLen` MATERIALIZED
    * CTE levels (materialization is load-bearing — inlined, each level
    * would re-expand its ≤`maxPieceLen` predecessors into
    * tetranacci-many subtree copies), per-step argbest via
    * `ORDER BY score DESC, seg ASC`. Uncoverable target words drop out
    * naturally: no path reaches their final DP level.
    */
  def segmentApplyOracleSql(table: String, textCol: String,
                            targetTable: String, targetTextCol: String,
                            maxPieceLen: Int, minFreq: Long, maxWordLen: Int): String =
    s"""WITH ${vocabCtes(table, textCol, maxPieceLen, minFreq)},
       |twords AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS wcnt FROM (
       |    SELECT unnest(${toksSql(targetTextCol)}) AS word FROM $targetTable
       |  ) GROUP BY 1
       |),
       |${dpInitSql("b", maxWordLen)},
       |${dpStepsSql("b", "scored", maxPieceLen, maxWordLen)},
       |final AS (
       |  ${dpFinalsSql("b", maxWordLen)}
       |)
       |SELECT w.word, w.wcnt, f.np AS n_pieces, f.score AS score_micro, f.seg
       |FROM final f JOIN twords w USING (word)""".stripMargin

  private def dpInitSql(prefix: String, maxWordLen: Int): String =
    s"""${prefix}0 AS MATERIALIZED (
       |  SELECT word, CAST(0 AS BIGINT) AS score, '' AS seg, 0 AS np
       |  FROM twords WHERE strlen(word) <= $maxWordLen
       |)""".stripMargin

  private def dpStepsSql(prefix: String, scoredName: String,
                         maxPieceLen: Int, maxWordLen: Int): String =
    (1 to maxWordLen).map { i =>
      val incoming = (1 to maxPieceLen).flatMap { l =>
        val j = i - l
        if (j < 0) None
        else Some(
          s"SELECT b.word, b.score + v.vscore AS score, CASE WHEN b.seg = '' THEN v.piece ELSE b.seg || '|' || v.piece END AS seg, b.np + 1 AS np " +
            s"FROM $prefix$j b JOIN $scoredName v ON v.piece = substr(b.word, ${j + 1}, $l) WHERE strlen(b.word) >= $i")
      }.mkString("\n      UNION ALL ")
      s"""$prefix$i AS MATERIALIZED (
         |  SELECT word, score, seg, np FROM (
         |    SELECT word, score, seg, np,
         |      row_number() OVER (PARTITION BY word ORDER BY score DESC, seg ASC) AS rn
         |    FROM (
         |      $incoming
         |    )
         |  ) WHERE rn = 1
         |)""".stripMargin
    }.mkString(",\n")

  private def dpFinalsSql(prefix: String, maxWordLen: Int): String =
    (1 to maxWordLen)
      .map(i => s"SELECT * FROM $prefix$i WHERE strlen(word) = $i")
      .mkString("\n  UNION ALL ")

  /** DuckDB mirror of [[emSegment]]: the round-1 DP (prefix `b`, counts-
    * initialized `scored`), the hard-count re-estimation over round-1
    * segmentations, and the round-2 DP (prefix `c`) under `scored2` —
    * every argmax of BOTH passes and the re-scored model itself are
    * cross-engine-checked.
    */
  def emSegmentOracleSql(table: String, textCol: String,
                         maxPieceLen: Int, minFreq: Long, maxWordLen: Int): String =
    s"""WITH ${vocabCtes(table, textCol, maxPieceLen, minFreq)},
       |twords AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS wcnt FROM (
       |    SELECT unnest(${toksSql(textCol)}) AS word FROM $table
       |  ) GROUP BY 1
       |),
       |${dpInitSql("b", maxWordLen)},
       |${dpStepsSql("b", "scored", maxPieceLen, maxWordLen)},
       |final1 AS (
       |  ${dpFinalsSql("b", maxWordLen)}
       |),
       |pc AS (
       |  SELECT piece, CAST(SUM(w.wcnt) AS BIGINT) AS cnt FROM (
       |    SELECT word, unnest(string_split(seg, '|')) AS piece FROM final1
       |  ) p JOIN twords w USING (word) GROUP BY piece
       |),
       |ptot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM pc),
       |scored2 AS MATERIALIZED (
       |  SELECT piece, cnt,
       |         CAST(round((ln(cnt) - ln(total)) * 1000000) AS BIGINT) AS vscore
       |  FROM pc, ptot
       |),
       |${dpInitSql("c", maxWordLen)},
       |${dpStepsSql("c", "scored2", maxPieceLen, maxWordLen)},
       |final2 AS (
       |  ${dpFinalsSql("c", maxWordLen)}
       |)
       |SELECT w.word, w.wcnt, f.np AS n_pieces, f.score AS score_micro, f.seg
       |FROM final2 f JOIN twords w USING (word)""".stripMargin
}
