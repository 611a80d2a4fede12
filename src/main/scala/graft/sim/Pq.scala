package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the compressed-codes tier of the ANN
  * stack (brute force → SQ8 → IVF → PQ): split each vector into `m`
  * subspaces, encode every subvector as the id of its nearest codebook
  * entry, and answer queries with asymmetric distance computation (ADC):
  * `d²(q, v) ≈ Σ_s d²(q_s, codebook[s][code(v, s)])` — the corpus is
  * touched only through its m-byte codes while queries stay exact
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011).
  *
  * Scale shape: the codebook (m × nCodes subvectors) and the per-query
  * distance tables (nQueries × m × nCodes scalars) both BROADCAST; the
  * corpus is encoded in one narrow pass and the ADC scan is a broadcast
  * join against the codes relation — nothing corpus-sized ever shuffles,
  * and at 100 TB the codes relation is ~dim×4/m times smaller than the
  * raw vectors (here 64 doubles → 4 ints).
  *
  * Oracle-ability: codebook entries are DATA POINTS chosen
  * deterministically (subvectors of `id < nCodes` — the same pivot trick
  * as `ivfRecall`), every subspace distance accumulates left-to-right in
  * doubles, and the final ADC sum is a FIXED-ORDER m-term addition
  * (pivoted per subspace, never a distributed reduce) — so approximate
  * distances are bit-identical in DuckDB and the ranking hash-matches.
  */
object Pq {

  /** Sequential left-to-right squared-L2 over double arrays (same
    * accumulation shape as VectorOps.l2Distance, sans sqrt). */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v)

  /** (vid, s, sub) subvector rows of every vector: subspace `s` covers
    * 1-based slice [s·d + 1, s·d + d]. */
  private def subRows(embD: DataFrame, m: Int, d: Int): DataFrame =
    embD.select(
      col("vid"),
      explode(sequence(lit(0), lit(m - 1))).as("s"),
      col("e"))
      .select(col("vid"), col("s"),
        slice(col("e"), col("s") * lit(d) + lit(1), lit(d)).as("sub"))

  /** PQ-ADC top-k: `(query_id, neighbor_id, pq_d2, rank)` for every
    * query `id < nQueries`, ranked by approximate squared distance
    * (ascending, neighbor-id tiebreak). Codebook = subvectors of
    * `id < nCodes`; ties in encoding break toward the lower code id.
    */
  def pqTopK(emb: DataFrame, idCol: String, vecCol: String,
             dim: Int, m: Int, nCodes: Int, k: Int, nQueries: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val d = dim / m
    val embD = emb.select(
      col(idCol).as("vid"),
      transform(col(vecCol), x => x.cast("double")).as("e"))
    val sub = subRows(embD, m, d)
    val codebook = sub.filter(col("vid") < nCodes)
      .select(col("s"), col("vid").cast("int").as("code"), col("sub").as("csub"))
    // encode: nearest codebook entry per (vid, s) — min_by on a
    // (distance, code) struct gives the argmin with the code tiebreak in
    // ONE partial-aggregated pass; the codebook broadcasts
    val codes = sub
      .join(broadcast(codebook), Seq("s"))
      .groupBy(col("vid"), col("s"))
      .agg(min_by(col("code"),
        struct(l2sq(col("sub"), col("csub")).as("d2"), col("code"))).as("code"))
    // per-query distance tables: d²(q_s, codebook[s][c]) for every cell
    val dt = sub.filter(col("vid") < nQueries)
      .select(col("vid").as("query_id"), col("s"), col("sub").as("qsub"))
      .join(broadcast(codebook), Seq("s"))
      .select(col("query_id"), col("s"), col("code"),
        l2sq(col("qsub"), col("csub")).as("qd2"))
    // ADC: table lookups per (vid, s), then a FIXED-ORDER m-term sum
    // (pivot per subspace — a distributed sum's accumulation order would
    // break double bit-parity with the oracle)
    val pivots = (0 until m).map(i =>
      max(when(col("s") === i, col("qd2"))).as(s"_d$i"))
    val approx = codes
      .join(broadcast(dt), Seq("s", "code"))
      .groupBy(col("query_id"), col("vid").as("neighbor_id"))
      .agg(pivots.head, pivots.tail: _*)
      .withColumn("pq_d2",
        (0 until m).map(i => col(s"_d$i")).reduce(_ + _))
    val w = Window.partitionBy("query_id").orderBy(asc("pq_d2"), asc("neighbor_id"))
    approx
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "pq_d2", "rank")
  }

  /** Recall@k of [[pqTopK]] against the EXACT squared-L2 top-k, one
    * `(query_id, n_hits)` row per query — approximation quality as a
    * hash-checked number, not a spec promise. */
  def pqRecall(emb: DataFrame, idCol: String, vecCol: String,
               dim: Int, m: Int, nCodes: Int, k: Int, nQueries: Int): DataFrame = {
    val embD = emb.select(
      col(idCol).as("vid"),
      transform(col(vecCol), x => x.cast("double")).as("e"))
    val queries = embD.filter(col("vid") < nQueries)
      .select(col("vid").as("query_id"), col("e").as("qe"))
    val exact = embD
      .join(broadcast(queries), col("query_id") =!= col("vid"))
      .withColumn("d2", l2sq(col("qe"), col("e")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(asc("d2"), asc("vid"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vid").as("neighbor_id"))
    val pq = pqTopK(emb, idCol, vecCol, dim, m, nCodes, k, nQueries)
      .select("query_id", "neighbor_id")
    val hits = exact.join(pq, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    queries.select("query_id")
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  private def l2sqSql(a: String, b: String, d: Int): String =
    s"list_sum(list_transform(range(1, ${d + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"

  private def commonCtes(table: String, idCol: String, vecCol: String,
                         dim: Int, m: Int, nCodes: Int, nQueries: Int): String = {
    val d = dim / m
    val ss = (0 until m).mkString(", ")
    s"""v AS (SELECT $idCol AS vid, CAST($vecCol AS DOUBLE[]) AS e FROM $table),
       |sub AS (
       |  SELECT vid, s, list_transform(range(s * $d + 1, s * $d + ${d + 1}), i -> e[i]) AS sub
       |  FROM v CROSS JOIN (SELECT unnest([$ss]) AS s)
       |),
       |cb AS (SELECT s, CAST(vid AS INTEGER) AS code, sub AS csub FROM sub WHERE vid < $nCodes),
       |enc AS (
       |  SELECT vid, s, code FROM (
       |    SELECT sub.vid, sub.s, cb.code,
       |      row_number() OVER (PARTITION BY sub.vid, sub.s
       |        ORDER BY ${l2sqSql("sub.sub", "cb.csub", d)} ASC, cb.code ASC) AS rn
       |    FROM sub JOIN cb ON sub.s = cb.s) WHERE rn = 1
       |),
       |dt AS (
       |  SELECT sub.vid AS query_id, sub.s, cb.code,
       |         ${l2sqSql("sub.sub", "cb.csub", d)} AS qd2
       |  FROM sub JOIN cb ON sub.s = cb.s WHERE sub.vid < $nQueries
       |),
       |adc AS (
       |  SELECT dt.query_id, enc.vid AS neighbor_id,
       |         ${(0 until m).map(i => s"max(CASE WHEN enc.s = $i THEN dt.qd2 END)").mkString(" + ")} AS pq_d2
       |  FROM enc JOIN dt ON enc.s = dt.s AND enc.code = dt.code
       |  GROUP BY 1, 2
       |)""".stripMargin
  }

  /** DuckDB mirror of [[pqTopK]] — same pivots, same fixed-order ADC
    * sum, same tiebreaks. */
  def pqTopKOracleSql(table: String, idCol: String, vecCol: String,
                      dim: Int, m: Int, nCodes: Int, k: Int, nQueries: Int): String =
    s"""WITH ${commonCtes(table, idCol, vecCol, dim, m, nCodes, nQueries)}
       |SELECT query_id, neighbor_id, pq_d2, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT query_id, neighbor_id, pq_d2,
       |    row_number() OVER (PARTITION BY query_id ORDER BY pq_d2 ASC, neighbor_id ASC) AS rank
       |  FROM adc WHERE query_id <> neighbor_id
       |) WHERE rank <= $k""".stripMargin

  /** DuckDB mirror of [[pqRecall]]. */
  def pqRecallOracleSql(table: String, idCol: String, vecCol: String,
                        dim: Int, m: Int, nCodes: Int, k: Int, nQueries: Int): String =
    s"""WITH ${commonCtes(table, idCol, vecCol, dim, m, nCodes, nQueries)},
       |pq AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY pq_d2 ASC, neighbor_id ASC) AS rank
       |    FROM adc WHERE query_id <> neighbor_id
       |  ) WHERE rank <= $k
       |),
       |q AS (SELECT vid AS query_id, e AS qe FROM v WHERE vid < $nQueries),
       |bf AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.query_id, c.vid AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${l2sqSql("q.qe", "c.e", dim)} ASC, c.vid ASC) AS rank
       |    FROM v c JOIN q ON q.query_id <> c.vid
       |  ) WHERE rank <= $k
       |)
       |SELECT q.query_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits
       |FROM q LEFT JOIN (
       |  SELECT bf.query_id, count(*) AS n
       |  FROM bf JOIN pq ON bf.query_id = pq.query_id AND bf.neighbor_id = pq.neighbor_id
       |  GROUP BY 1) h ON q.query_id = h.query_id""".stripMargin
}
