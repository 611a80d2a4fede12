package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword relevance over a document table — the retrieval scorer a
  * corpus pipeline runs to mine query-relevant training examples. Uses the
  * standard Okapi formulation with the +1 idf floor (Robertson/Sparck
  * Jones; the `ln(1 + (N − df + 0.5)/(df + 0.5))` form every open-source
  * engine ships, so idf is always positive):
  *
  *   score(D, Q) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
  *
  * Tokenization is [[TextOps.tokens]] (lowercase alpha runs), the same
  * split the tf-idf and vocabulary operators use.
  *
  * Scale shape: the token explode is filtered to the query's terms BEFORE
  * aggregation, so the shuffled tf frame is |docs|·|Q|-bounded, not
  * corpus-token-sized; document length comes from the same scan without
  * exploding (`size(tokens)`); df and avgdl are |Q|-row / 1-row frames that
  * broadcast onto the scoring join. One full scan, two broadcasts, one
  * final groupBy doc.
  */
object Bm25 {

  def scores(docs: DataFrame, idCol: String, textCol: String,
             queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val terms = queryTerms.map(_.toLowerCase)

    // (doc, len) — no explode; (doc, term, tf) — explode filtered to Q
    val withLen = docs.select(
      col(idCol), TextOps.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), col("_toks"), size(col("_toks")).cast("double").as("_dl"))
    val tf = withLen
      .select(col(idCol), col("_dl"), explode(col("_toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("_dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))

    // corpus stats: N and avgdl in ONE 1-row frame; df per query term
    val stats = withLen.agg(
      count(lit(1)).cast("double").as("_n_docs"),
      avg(col("_dl")).as("_avgdl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))

    val idf = log(lit(1.0) + (col("_n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / col("_avgdl")))
    // per-term contributions are deterministic doubles (identical formula
    // on identical inputs), but their per-doc SUM is order-sensitive in
    // float — round each term to 9 and accumulate as exact decimal so the
    // total is independent of partitioning and engine
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col(idCol), round(idf * tfNorm, 9).cast("decimal(18,9)").as("_s"))
      .groupBy(idCol)
      .agg(round(sum("_s").cast("double"), 6).as("score"))
  }

  /** DuckDB mirror of [[scores]] — same tokenization regex, same floor
    * formula, same rounding. */
  def oracleSql(table: String, idCol: String, textCol: String,
                queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): String =
    s"""WITH ${scoresCtes(table, idCol, textCol, queryTerms, k1, b)}
       |SELECT $idCol, score FROM bm25_scores""".stripMargin

  /** The same oracle as [[oracleSql]], packaged as a CTE chain ending in
    * `bm25_scores($idCol, score)` — composable into larger oracles (the
    * RRF fusion row reuses it verbatim, so the lexical leg of a hybrid
    * ranking is checked by the same text that checks `t_bm25`).
    */
  def scoresCtes(table: String, idCol: String, textCol: String,
                 queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): String = {
    val termList = queryTerms.map(t => s"'${t.toLowerCase}'").mkString(", ")
    s"""lens AS (
       |  SELECT $idCol, CAST(len(list_filter(regexp_split_to_array(lower($textCol), '[^a-z]+'), x -> x <> '')) AS DOUBLE) AS dl
       |  FROM $table
       |), tf AS (
       |  SELECT $idCol, dl, term, CAST(count(*) AS DOUBLE) AS tf FROM (
       |    SELECT l.$idCol, l.dl,
       |           unnest(list_filter(regexp_split_to_array(lower(t.$textCol), '[^a-z]+'), x -> x <> '')) AS term
       |    FROM $table t JOIN lens l USING ($idCol)
       |  ) WHERE term IN ($termList) GROUP BY 1, 2, 3
       |), stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM lens
       |), dfreq AS (
       |  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1
       |), bm25_scores AS (
       |  SELECT tf.$idCol,
       |         round(CAST(SUM(CAST(round(
       |           ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
       |           (tf * ${k1 + 1.0}) / (tf + $k1 * (${1.0 - b} + $b * dl / avgdl))
       |         , 9) AS DECIMAL(18,9))) AS DOUBLE), 6) AS score
       |  FROM tf JOIN dfreq USING (term), stats
       |  GROUP BY 1
       |)""".stripMargin
  }
}
