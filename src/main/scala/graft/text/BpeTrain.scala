package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (Sennrich et al. 2016), exactly
  * oracled — the tokenizer-training step of an LLM data pipeline run as
  * unrolled deterministic rounds, the same discipline as the
  * PageRank/BFS/Lloyd iterated oracles:
  *
  *   vocab    = per-distinct-word frequency (ONE corpus hash-agg; every
  *              later round works on the |distinct words| frame, never
  *              the corpus);
  *   round r  = count all adjacent symbol pairs weighted by word
  *              frequency (explode + hash-agg) → argmax with a
  *              lexicographic tiebreak (1-row limit) → apply the merge
  *              with a delimiter-bounded literal `replace` on every
  *              word's symbolization.
  *
  * Merge application is non-overlapping left-to-right `replace`, run
  * TWICE per round: a single pass consumes the shared boundary
  * delimiter and skips every other occurrence in an alternating run
  * (…|a|b|a|b|… merges the 1st and 3rd pair, not the 2nd); the second
  * pass picks up exactly those blocked occurrences, matching the greedy
  * left-to-right pairing a BPE encoder produces. Counts are exact
  * integers, ties break on the pair string, so every learned merge is
  * bit-reproducible in DuckDB through the identical unrolled CTE chain.
  *
  * Scale shape: the corpus is read ONCE (word counts, map-side
  * combined). Each round is two hash-aggs + a broadcast of the single
  * winning pair over the vocab frame — no shuffle grows with rounds,
  * and `localCheckpoint` keeps the per-round plan flat.
  *
  * ROUNDS BOUND: exact sequential training costs 2 Spark jobs per merge.
  * Fine at the declared oracle fidelity (≤8 rounds); at a production
  * 32k-merge vocab it is ~64k sequential jobs — hours of scheduler
  * latency alone, regardless of data size. The scale path is
  * [[learnMergesBatched]]: top-m symbol-disjoint merges per round (2
  * jobs per m merges — a 32k vocab at m=256 is ~250 rounds), the same
  * batching production BPE trainers use. When the picked pairs share no
  * symbol AND merging one cannot promote a new pair above a later pick,
  * a batch round is exactly m sequential rounds (property-spec'd);
  * otherwise the merge ORDER may differ near count ties — the standard
  * large-vocab approximation, never a malformed merge (each picked pair
  * is applied with the same delimiter-bounded double-replace).
  */
object BpeTrain {

  /** @return the learned merge table: (round, left_sym, right_sym, cnt),
    *         one row per round, in training order.
    */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame =
    train(docs, textCol, rounds)._1

  /** Train-then-ENCODE round trip: per-document BPE token counts under
    * the learned merges, next to the pre-merge character count — the
    * compression readout (chars/token) a tokenizer report shows. The
    * encode step is free: the final vocab's symbolization IS the
    * encoding of every distinct word; documents join it by word.
    */
  def encodedTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                         rounds: Int): DataFrame = {
    val vocab = train(docs, textCol, rounds)._2
    val perWord = vocab.select(col("w"),
      size(filter(split(col("sym"), "\\|"), x => x =!= "")).cast("long").as("n_sym"),
      length(col("w")).cast("long").as("n_chars"))
    docs
      .select(col(idCol).as("doc_id"), explode(TextOps.tokens(col(textCol))).as("w"))
      .join(perWord, "w")
      .groupBy("doc_id")
      .agg(sum("n_sym").as("n_bpe_tokens"), sum("n_chars").as("n_chars"))
  }

  /** Per-word symbolization readout of the trained vocab: (w, freq,
    * n_sym) — the distinct-word encode table the [[TokenizerEval]]
    * bake-off consumes (documents join it by word for per-doc counts).
    */
  def vocabSymbolization(docs: DataFrame, textCol: String, rounds: Int): DataFrame =
    train(docs, textCol, rounds)._2.select(col("w"), col("freq"),
      size(filter(split(col("sym"), "\\|"), x => x =!= "")).cast("long").as("n_sym"))

  /** DuckDB mirror of [[vocabSymbolization]]. */
  def vocabSymbolizationOracleSql(table: String, textCol: String, rounds: Int): String =
    s"""WITH ${trainCtes(table, textCol, rounds)}
       |SELECT w, freq,
       |       CAST(len(list_filter(string_split(sym, '|'), x -> x <> '')) AS BIGINT) AS n_sym
       |FROM v$rounds""".stripMargin

  /** Batched multi-merge training — the 32k-vocab scale path (see the
    * ROUNDS BOUND note above): each round counts pairs ONCE, reads the
    * top `4·m` candidates to the driver (a bounded k-row readout, like
    * every argmax readout in this engine), greedily keeps the first `m`
    * that share no symbol with an earlier pick, and applies all of them
    * in ONE chained-replace projection — 2 jobs per `m` merges instead
    * of per merge. Merge indices are assigned in greedy (count, pair)
    * order, so `batch = 1` degenerates to exactly [[learnMerges]].
    *
    * @return (merge_idx, left_sym, right_sym, cnt) in training order
    */
  def learnMergesBatched(docs: DataFrame, textCol: String,
                         totalMerges: Int, batch: Int): DataFrame = {
    require(totalMerges > 0 && batch > 0, "needs totalMerges > 0, batch > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = initialVocab(docs, textCol)
    val out = scala.collection.mutable.ListBuffer[(Int, String, String, Long)]()
    var idx = 0
    var exhausted = false
    while (idx < totalMerges && !exhausted) {
      val m = math.min(batch, totalMerges - idx)
      // 4·m candidates: enough head-room that symbol collisions among the
      // top picks cannot starve the batch (worst case each pick excludes
      // pairs sharing its 2 symbols)
      val cands = pairCounts(vocab)
        .orderBy(desc("cnt"), asc("pair")).limit(math.max(4 * m, 16))
        .collect()
        .map { r =>
          val Array(l, rr) = r.getString(0).split(" ", 2)
          (l, rr, r.getLong(1))
        }
      val used = scala.collection.mutable.Set[String]()
      val picks = cands.iterator.filter { case (l, r, _) =>
        if (used(l) || used(r)) false
        else { used += l; used += r; true }
      }.take(m).toSeq
      if (picks.isEmpty) exhausted = true
      else {
        picks.foreach { case (l, r, c) => idx += 1; out += ((idx, l, r, c)) }
        // one projection applies every pick: the same double-replace per
        // pair, chained in greedy order (disjoint symbols ⇒ order-free)
        val sym = picks.foldLeft(col("sym")) { case (c, (l, r, _)) =>
          val pat = lit("|" + l + "|" + r + "|"); val rep = lit("|" + l + r + "|")
          replace(replace(c, pat, rep), pat, rep)
        }
        vocab = vocab.select(col("w"), col("freq"), sym.as("sym")).localCheckpoint()
      }
    }
    out.toSeq.toDF("merge_idx", "left_sym", "right_sym", "cnt")
  }

  /** ENCODE an arbitrary corpus with an already-trained merge list — the
    * deploy-time half of the tokenizer: unlike [[encodedTokenCounts]]
    * (whose vocab join only covers words seen in training), this applies
    * the merges to ANY word, in training order, with the identical
    * delimiter-bounded double-replace — the standard BPE encode
    * algorithm (merges applied by learned rank). The merge list is
    * driver-resident by contract (a tokenizer is KB-to-MB scale — the
    * same bounded-readout class as every argmax in this engine) and
    * compiles to ONE chained-replace projection over the |distinct
    * words| frame, joined back per document: pure codegen, zero joins
    * against the merge table.
    *
    * @param merges (left_sym, right_sym) in training order
    * @return (idCol, n_bpe_tokens, n_chars) per document
    */
  def applyMerges(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("w"))
    val encoded = merges.foldLeft(symbolize(col("w"))) { case (c, (l, r)) =>
      val pat = lit("|" + l + "|" + r + "|"); val rep = lit("|" + l + r + "|")
      replace(replace(c, pat, rep), pat, rep)
    }
    val perWord = words.select("w").distinct()
      .select(col("w"),
        size(filter(split(encoded, "\\|"), x => x =!= "")).cast("long").as("n_sym"),
        length(col("w")).cast("long").as("n_chars"))
    words.join(perWord, "w")
      .groupBy(idCol)
      .agg(sum("n_sym").as("n_bpe_tokens"), sum("n_chars").as("n_chars"))
  }

  /** DuckDB mirror of [[applyMerges]] composed with the training chain:
    * train on `trainTable.textCol` for `rounds` merges (the b1..bR CTEs),
    * then encode `encTable.encTextCol` by applying each round's merge in
    * order over the distinct-word frame.
    */
  def applyMergesOracleSql(trainTable: String, textCol: String, rounds: Int,
                           encTable: String, encIdCol: String,
                           encTextCol: String): String = {
    val applyCtes = (1 to rounds).map { r =>
      s"""w$r AS (
         |  SELECT w, replace(replace(sym, '|' || left_sym || '|' || right_sym || '|',
         |                    '|' || left_sym || right_sym || '|'),
         |            '|' || left_sym || '|' || right_sym || '|',
         |            '|' || left_sym || right_sym || '|') AS sym
         |  FROM w${r - 1}, b$r
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${trainCtes(trainTable, textCol, rounds)}, w0 AS (
       |  SELECT DISTINCT w,
       |         '|' || array_to_string(list_transform(range(1, strlen(w) + 1),
       |               i -> substr(w, i, 1)), '|') || '|' AS sym
       |  FROM (
       |    SELECT unnest(list_filter(regexp_split_to_array(lower($encTextCol), '[^a-z]+'),
       |           x -> x <> '')) AS w
       |    FROM $encTable
       |  )
       |), $applyCtes, pw AS (
       |  SELECT w,
       |         CAST(len(list_filter(string_split(sym, '|'), x -> x <> '')) AS BIGINT) AS n_sym,
       |         CAST(strlen(w) AS BIGINT) AS n_chars
       |  FROM w$rounds
       |), dw AS (
       |  SELECT $encIdCol,
       |         unnest(list_filter(regexp_split_to_array(lower($encTextCol), '[^a-z]+'),
       |                x -> x <> '')) AS w
       |  FROM $encTable
       |)
       |SELECT $encIdCol, CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens,
       |       CAST(SUM(n_chars) AS BIGINT) AS n_chars
       |FROM dw JOIN pw USING (w)
       |GROUP BY 1""".stripMargin
  }

  /** Delimiter-bounded per-char symbolization: "word" → "|w|o|r|d|". */
  private def symbolize(w: Column): Column =
    concat(lit("|"),
      array_join(transform(sequence(lit(1), length(w)),
        i => w.substr(i, lit(1))), "|"),
      lit("|"))

  /** One corpus hash-agg to the per-distinct-word frame (freq + the
    * delimiter-bounded per-char symbolization). */
  private def initialVocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("sym", symbolize(col("w")))
      .localCheckpoint()

  /** Frequency-weighted adjacent-pair counts over a vocab frame. */
  private def pairCounts(vocab: DataFrame): DataFrame = {
    val syms = filter(split(col("sym"), "\\|"), x => x =!= "")
    val pairCol = transform(sequence(lit(1), size(syms) - 1),
      i => concat(element_at(syms, i), lit(" "), element_at(syms, i + 1)))
    vocab
      .filter(size(syms) >= 2)
      .select(col("freq"), explode(pairCol).as("pair"))
      .groupBy("pair").agg(sum("freq").as("cnt"))
  }

  private def train(docs: DataFrame, textCol: String,
                    rounds: Int): (DataFrame, DataFrame) = {
    require(rounds > 0, "learnMerges needs rounds > 0")
    // per-char split via positions (split-on-empty-regex is
    // engine-ambiguous); sym = "|c1|c2|...|cn|"
    var vocab = initialVocab(docs, textCol)
    val merges = scala.collection.mutable.ListBuffer[DataFrame]()
    for (r <- 1 to rounds) {
      val best = pairCounts(vocab).orderBy(desc("cnt"), asc("pair")).limit(1)
        .select(
          element_at(split(col("pair"), " "), 1).as("left_sym"),
          element_at(split(col("pair"), " "), 2).as("right_sym"),
          col("cnt"))
        .localCheckpoint()
      merges += best.select(lit(r).as("round"), col("left_sym"),
        col("right_sym"), col("cnt"))
      val applyOnce =
        "replace(%s, '|' || left_sym || '|' || right_sym || '|'," +
          " '|' || left_sym || right_sym || '|')"
      vocab = vocab.crossJoin(broadcast(best))
        .withColumn("sym", expr(applyOnce.format(applyOnce.format("sym"))))
        .select(col("w"), col("freq"), col("sym"))
        .localCheckpoint()
    }
    (merges.reduce(_ unionByName _), vocab)
  }

  /** DuckDB mirror of [[learnMerges]]: the rounds unrolled as
    * (pairs → best → re-symbolized vocab) CTE triples.
    */
  def learnMergesOracleSql(table: String, textCol: String, rounds: Int): String = {
    val out = (1 to rounds)
      .map(r => s"SELECT $r AS round, left_sym, right_sym, cnt FROM b$r")
      .mkString("\n  UNION ALL ")
    s"""WITH ${trainCtes(table, textCol, rounds)}
       |SELECT * FROM (
       |  $out
       |)""".stripMargin
  }

  /** DuckDB mirror of [[encodedTokenCounts]]: the training chain plus
    * the per-word symbol counts joined back onto document words.
    */
  def encodeOracleSql(table: String, idCol: String, textCol: String,
                      rounds: Int): String =
    s"""WITH ${trainCtes(table, textCol, rounds)}, pw AS (
       |  SELECT w,
       |         CAST(len(list_filter(string_split(sym, '|'), x -> x <> '')) AS BIGINT) AS n_sym,
       |         CAST(strlen(w) AS BIGINT) AS n_chars
       |  FROM v$rounds
       |), dw AS (
       |  SELECT $idCol AS doc_id,
       |         unnest(list_filter(regexp_split_to_array(lower($textCol), '[^a-z]+'),
       |                x -> x <> '')) AS w
       |  FROM $table
       |)
       |SELECT doc_id, CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens,
       |       CAST(SUM(n_chars) AS BIGINT) AS n_chars
       |FROM dw JOIN pw USING (w)
       |GROUP BY 1""".stripMargin

  private def trainCtes(table: String, textCol: String, rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      val prev = s"v${r - 1}"
      s"""p$r AS (
         |  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, unnest(list_transform(range(1, len(syms)),
         |           i -> syms[i] || ' ' || syms[i + 1])) AS pair
         |    FROM (SELECT freq, list_filter(string_split(sym, '|'), x -> x <> '') AS syms
         |          FROM $prev)
         |    WHERE len(syms) >= 2
         |  ) GROUP BY 1
         |), b$r AS (
         |  SELECT string_split(pair, ' ')[1] AS left_sym,
         |         string_split(pair, ' ')[2] AS right_sym, cnt
         |  FROM p$r ORDER BY cnt DESC, pair LIMIT 1
         |), v$r AS (
         |  SELECT w, freq,
         |         replace(replace(sym, '|' || left_sym || '|' || right_sym || '|',
         |                         '|' || left_sym || right_sym || '|'),
         |                 '|' || left_sym || '|' || right_sym || '|',
         |                 '|' || left_sym || right_sym || '|') AS sym
         |  FROM $prev, b$r
         |)""".stripMargin
    }.mkString(", ")
    s"""v0 AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq,
       |         '|' || array_to_string(list_transform(range(1, strlen(w) + 1),
       |               i -> substr(w, i, 1)), '|') || '|' AS sym
       |  FROM (
       |    SELECT unnest(list_filter(regexp_split_to_array(lower($textCol), '[^a-z]+'),
       |           x -> x <> '')) AS w
       |    FROM $table
       |  ) GROUP BY 1
       |), $roundCtes""".stripMargin
  }
}
