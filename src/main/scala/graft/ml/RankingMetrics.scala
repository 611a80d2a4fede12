package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-evaluation metrics — NDCG@k, MRR, log-loss — the
  * search/RAG-retrieval eval pack. All float terms ride the
  * micro-scaled-integer pattern (round(x·1e6) → LONG before any sum), so
  * accumulation order cannot change an answer and every metric is
  * exactly mirrorable in the DuckDB oracle.
  *
  * Scale notes: NDCG@k only ever LOOKS at the top k rows per group —
  * the engine form takes them through the TopKPerKey bounded-heap
  * operator (one exchange, no per-group sort of the full data), then
  * ranks within the k·|groups| survivors. MRR needs the rank of the
  * FIRST relevant row, which may sit anywhere — that one rides the
  * partitioned rank window (the ml_auc_by_segment shape).
  */
object RankingMetrics {

  /** NDCG@k per group with binary relevance: DCG sums 1/log2(rank+1)
    * over relevant rows in the top k by (score DESC, id); ideal DCG sums
    * the same weights over the group's first min(k, n_pos) positives.
    * Emits (group, dcg_micro, idcg_micro, ndcg).
    */
  def ndcgAtK(df: DataFrame, group: String, score: String, id: String,
              rel: Column, k: Int): DataFrame = {
    val topk = graft.plans.TopKPerKey(
      df.withColumn("_rel", rel.cast("int")),
      Seq(group), Seq(col(score).desc, col(id).asc), k)
    val wAll = Window.partitionBy(group).orderBy(col(score).desc, col(id).asc)
    val ranked = topk.withColumn("_rank", row_number().over(wAll))
    val wPos = Window.partitionBy(group).orderBy(col(score).desc, col(id).asc)
    // weight at rank r: round(1e6 / (ln(r+1)/ln(2))) — micro-int
    def w(rankCol: Column): Column =
      round(lit(1e6) / (log(rankCol.cast("double") + 1.0) / log(lit(2.0)))).cast("long")
    val pos = ranked.filter(col("_rel") === 1)
      .withColumn("_prank", row_number().over(wPos))
    val dcg = pos.groupBy(group)
      .agg(sum(w(col("_rank"))).as("dcg_micro"))
    val idcg = pos.filter(col("_prank") <= k).groupBy(group)
      .agg(sum(w(col("_prank"))).as("idcg_micro"))
    // groups with zero positives in the top k drop out of dcg — restore
    // them from the full group list with ndcg = 0
    val groups = df.select(col(group)).distinct()
    groups
      .join(dcg, Seq(group), "left")
      .join(idcg, Seq(group), "left")
      .select(col(group),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"),
        coalesce(col("idcg_micro"), lit(0L)).as("idcg_micro"),
        round(when(coalesce(col("idcg_micro"), lit(0L)) === 0L, 0.0)
          .otherwise(coalesce(col("dcg_micro"), lit(0L)).cast("double") /
            col("idcg_micro").cast("double")), 6).as("ndcg"))
  }

  /** DuckDB mirror of [[ndcgAtK]]. */
  def ndcgOracleSql(table: String, group: String, score: String, id: String,
                    relSql: String, k: Int): String =
    s"""WITH ranked AS (
       |  SELECT $group AS g, ($relSql) AS rel,
       |         ROW_NUMBER() OVER (PARTITION BY $group
       |           ORDER BY $score DESC NULLS LAST, $id) AS r
       |  FROM $table
       |), pos AS (
       |  SELECT g, r,
       |         ROW_NUMBER() OVER (PARTITION BY g ORDER BY r) AS pr
       |  FROM ranked WHERE rel = 1 AND r <= $k
       |), dcg AS (
       |  SELECT g, SUM(CAST(round(1e6 / (ln(CAST(r AS DOUBLE) + 1.0) / ln(2.0))) AS BIGINT)) AS dcg_micro
       |  FROM pos GROUP BY 1
       |), idcg AS (
       |  SELECT g, SUM(CAST(round(1e6 / (ln(CAST(pr AS DOUBLE) + 1.0) / ln(2.0))) AS BIGINT)) AS idcg_micro
       |  FROM pos WHERE pr <= $k GROUP BY 1
       |)
       |SELECT gs.g AS $group,
       |       CAST(coalesce(dcg.dcg_micro, 0) AS BIGINT) AS dcg_micro,
       |       CAST(coalesce(idcg.idcg_micro, 0) AS BIGINT) AS idcg_micro,
       |       round(CASE WHEN coalesce(idcg.idcg_micro, 0) = 0 THEN 0.0
       |             ELSE CAST(coalesce(dcg.dcg_micro, 0) AS DOUBLE) /
       |                  CAST(idcg.idcg_micro AS DOUBLE) END, 6) AS ndcg
       |FROM (SELECT DISTINCT $group AS g FROM $table) gs
       |LEFT JOIN dcg ON gs.g = dcg.g
       |LEFT JOIN idcg ON gs.g = idcg.g""".stripMargin

  /** Average precision at k per group (the MAP readout before the final
    * mean): `AP@k = Σ_{relevant rank r ≤ k} P@r / min(k, R)` with
    * `P@r = (# relevant in top r) / r` and `R` the group's TOTAL relevant
    * count (TREC convention — a group whose positives all sit beyond k
    * scores 0, not undefined). Per-row terms are micro-scaled integers,
    * so the sum is order-independent and exactly mirrorable.
    *
    * Emits `(group, n_rel, ap)`; `ap = 0` for groups with no positives.
    *
    * Scale shape: only the top k rows per group are ever ranked (the
    * TopKPerKey bounded heap — one exchange, no full per-group sort);
    * the total-relevant count is ONE hash aggregation over the data.
    */
  def mapAtK(df: DataFrame, group: String, score: String, id: String,
             rel: Column, k: Int): DataFrame = {
    val marked = df.withColumn("_rel", rel.cast("int"))
    val topk = graft.plans.TopKPerKey(
      marked, Seq(group), Seq(col(score).desc, col(id).asc), k)
    val w = Window.partitionBy(group).orderBy(col(score).desc, col(id).asc)
    val ranked = topk.withColumn("_rank", row_number().over(w))
    val pos = ranked.filter(col("_rel") === 1)
      .withColumn("_prank", row_number().over(w))
    // P@r = prank / r at each relevant rank — micro-int before the sum
    val apSum = pos.groupBy(group)
      .agg(sum(round(lit(1e6) * col("_prank").cast("double") /
        col("_rank").cast("double")).cast("long")).as("ap_micro"))
    val rels = marked.filter(col("_rel") === 1)
      .groupBy(group).agg(count(lit(1)).as("n_rel"))
    val groups = df.select(col(group)).distinct()
    groups
      .join(rels, Seq(group), "left")
      .join(apSum, Seq(group), "left")
      .select(col(group),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        round(when(coalesce(col("n_rel"), lit(0L)) === 0L, 0.0)
          .otherwise(coalesce(col("ap_micro"), lit(0L)).cast("double") /
            (lit(1e6) * least(lit(k.toLong), col("n_rel")).cast("double"))), 6)
          .as("ap"))
  }

  /** DuckDB mirror of [[mapAtK]]. */
  def mapOracleSql(table: String, group: String, score: String, id: String,
                   relSql: String, k: Int): String =
    s"""WITH ranked AS (
       |  SELECT $group AS g, ($relSql) AS rel,
       |         ROW_NUMBER() OVER (PARTITION BY $group
       |           ORDER BY $score DESC NULLS LAST, $id) AS r
       |  FROM $table
       |), pos AS (
       |  SELECT g, r,
       |         ROW_NUMBER() OVER (PARTITION BY g ORDER BY r) AS pr
       |  FROM ranked WHERE rel = 1 AND r <= $k
       |), ap AS (
       |  SELECT g, SUM(CAST(round(1e6 * CAST(pr AS DOUBLE) / CAST(r AS DOUBLE)) AS BIGINT)) AS ap_micro
       |  FROM pos GROUP BY 1
       |), rels AS (
       |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_rel FROM ranked WHERE rel = 1 GROUP BY 1
       |)
       |SELECT gs.g AS $group,
       |       coalesce(rels.n_rel, 0) AS n_rel,
       |       round(CASE WHEN coalesce(rels.n_rel, 0) = 0 THEN 0.0
       |             ELSE CAST(coalesce(ap.ap_micro, 0) AS DOUBLE) /
       |                  (1e6 * CAST(LEAST($k, rels.n_rel) AS DOUBLE)) END, 6) AS ap
       |FROM (SELECT DISTINCT $group AS g FROM $table) gs
       |LEFT JOIN rels ON gs.g = rels.g
       |LEFT JOIN ap ON gs.g = ap.g""".stripMargin

  /** Reciprocal rank of the FIRST relevant row per group under
    * (score DESC, id) — emits (group, first_rel_rank, rr) with
    * rr = round(1e6/rank)/1e6 (micro-int, engine-portable).
    */
  def mrr(df: DataFrame, group: String, score: String, id: String,
          rel: Column): DataFrame = {
    val w = Window.partitionBy(group).orderBy(col(score).desc, col(id).asc)
    df.withColumn("_rel", rel.cast("int"))
      .withColumn("_rank", row_number().over(w))
      .filter(col("_rel") === 1)
      .groupBy(group)
      .agg(min(col("_rank")).as("first_rel_rank"))
      .withColumn("rr",
        round(round(lit(1e6) / col("first_rel_rank").cast("double")).cast("long")
          .cast("double") / 1e6, 6))
  }

  /** DuckDB mirror of [[mrr]]. */
  def mrrOracleSql(table: String, group: String, score: String, id: String,
                   relSql: String): String =
    s"""WITH ranked AS (
       |  SELECT $group, ($relSql) AS rel,
       |         ROW_NUMBER() OVER (PARTITION BY $group
       |           ORDER BY $score DESC NULLS LAST, $id) AS r
       |  FROM $table
       |)
       |SELECT $group, MIN(r) AS first_rel_rank,
       |       round(CAST(CAST(round(1e6 / CAST(MIN(r) AS DOUBLE)) AS BIGINT) AS DOUBLE) / 1e6, 6) AS rr
       |FROM ranked WHERE rel = 1
       |GROUP BY 1""".stripMargin

  /** Binary log-loss over a deterministic probability column, clamped to
    * [eps, 1−eps]; per-row terms micro-scaled to LONGs before the mean.
    * Emits one row per group: (group, n, logloss).
    */
  def logLoss(df: DataFrame, group: String, prob: Column, label: Column,
              eps: Double = 1e-6): DataFrame = {
    val p = least(greatest(prob, lit(eps)), lit(1.0 - eps))
    val y = label.cast("double")
    val term = round((y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p)) * -1e6).cast("long")
    df.select(col(group), term.as("_t"))
      .groupBy(group)
      .agg(count(lit(1)).as("n"),
        round(sum("_t").cast("double") / (count(lit(1)) * 1e6), 6).as("logloss"))
  }

  /** DuckDB mirror of [[logLoss]]. */
  def logLossOracleSql(table: String, group: String, probSql: String,
                       labelSql: String, eps: Double = 1e-6): String =
    s"""WITH t AS (
       |  SELECT $group,
       |         CAST(round((($labelSql) * ln(LEAST(GREATEST($probSql, $eps), ${1.0 - eps})) +
       |               (1.0 - ($labelSql)) * ln(1.0 - LEAST(GREATEST($probSql, $eps), ${1.0 - eps}))) * -1e6) AS BIGINT) AS term
       |  FROM $table
       |)
       |SELECT $group, CAST(count(*) AS BIGINT) AS n,
       |       round(CAST(SUM(term) AS DOUBLE) / (count(*) * 1e6), 6) AS logloss
       |FROM t GROUP BY 1""".stripMargin
}
