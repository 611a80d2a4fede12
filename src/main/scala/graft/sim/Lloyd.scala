package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exactly-oracled distributed Lloyd k-means — the iterative-ML
  * counterpart of the PageRank/BFS iterated-join family: every Lloyd
  * round is (assignment = broadcast-centroid argmin join) →
  * (update = per-cluster exact integer sums), unrolled a fixed number of
  * rounds, so the WHOLE fit — every assignment, every centroid, the
  * final inertia — is reproducible in SQL with zero model internals
  * (contrast `Similarity.kmeansCentroids`, which delegates to MLlib and
  * lands in the spec-only tier).
  *
  * Determinism contract (the same discipline as the RHP-LSH oracle):
  *   - vectors are quantized to integer micros (`round(x·1e6)` longs)
  *     ONCE, so member sums are exact longs;
  *   - centroid means are ONE double division of exact longs;
  *   - distances fold left-to-right over the dimension axis on both
  *     engines (array fold vs `list_sum(list_transform(...))`), so the
  *     doubles agree bitwise; ties break on cluster_id;
  *   - per-member distances round to integer micro² BEFORE the inertia
  *     sum, which is therefore an order-independent exact long.
  *
  * Init = data-point pivots (`vec_id < k`, the IVF-Flat convention).
  * Clusters that lose every member drop out (a standard Lloyd variant) —
  * both engines derive surviving centroids from the same group-by.
  *
  * Scale shape per round: the centroid table is k rows (broadcast); the
  * assignment is a per-row argmin over k in one codegen'd projection —
  * no shuffle; the update is one (cluster, dim)-keyed hash aggregation
  * with map-side combine. Rounds are a fixed small constant. At 100 TB
  * this is exactly MLlib's KMeans data path, minus the driver-resident
  * model state and plus a cross-engine proof of every intermediate.
  */
object Lloyd {

  private def quantize(vecCol: Column): Column =
    transform(vecCol, x => round(x.cast("double") * 1000000.0).cast("long"))

  /** Squared distance in micro² between an integer-micro vector `q` and
    * a double-micro centroid mean `m`, folded left-to-right.
    */
  private def dist2(q: Column, m: Column): Column =
    aggregate(
      zip_with(q, m, (x, mm) => (x.cast("double") - mm) * (x.cast("double") - mm)),
      lit(0.0), (acc, v) => acc + v)

  /** Run `iters` Lloyd rounds; returns `(final assignment, final
    * centroids)` — the shared core of [[fitStats]] (readout) and
    * [[fitCentroids]] (coarse-quantizer export).
    */
  private def fit(emb: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int): (DataFrame, DataFrame) = {
    require(k > 0 && iters > 0, "Lloyd needs k > 0, iters > 0")
    val vecs = emb.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("q"))
    // init: data-point pivots, mean = the point itself
    var centroids = vecs.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cluster_id"),
        transform(col("q"), x => x.cast("double")).as("m"))
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      val scoredK = vecs.crossJoin(broadcast(centroids))
        .withColumn("_d", dist2(col("q"), col("m")))
      // argmin as a partial-aggregable min_by (map-side combine — the
      // exchange moves one candidate per vector, never the n×k frame);
      // (d, cluster_id) lexicographic ordering matches the oracle's
      // ROW_NUMBER tiebreak exactly
      assigned = scoredK
        .groupBy("vec_id")
        .agg(min_by(struct(col("cluster_id"), col("_d")),
          struct(col("_d"), col("cluster_id"))).as("_b"))
        .select(col("vec_id"), col("_b.cluster_id").as("cluster_id"),
          col("_b._d").as("_d"))
      val sums = assigned.join(vecs, "vec_id")
        .select(col("cluster_id"), posexplode(col("q")).as(Seq("pos", "x")))
        .groupBy("cluster_id", "pos")
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
      centroids = sums
        .groupBy("cluster_id")
        .agg(
          transform(array_sort(collect_list(struct(col("pos"), col("sx")))),
            s => s.getField("sx")).as("_s"),
          max(col("cnt")).as("_n"))
        .select(col("cluster_id"),
          transform(col("_s"), x => x.cast("double") / col("_n")).as("m"))
    }
    (assigned, centroids)
  }

  /** Run `iters` Lloyd rounds; returns the final per-cluster readout
    * `(cluster_id, n_members, inertia_micro2)`.
    */
  def fitStats(emb: DataFrame, idCol: String, vecCol: String,
               k: Int, iters: Int): DataFrame = {
    val (assigned, _) = fit(emb, idCol, vecCol, k, iters)
    assigned
      .groupBy("cluster_id")
      .agg(
        count(lit(1)).as("n_members"),
        sum(round(col("_d")).cast("long")).as("inertia_micro2"))
      .select(col("cluster_id"), col("n_members"), col("inertia_micro2"))
  }

  /** Deterministic coarse-quantizer export: the final Lloyd centroid
    * table `(cluster_id, cvec)` after `iters` rounds, in the same shape
    * `Similarity.ivfTopK` broadcasts. Centroid components are exact-long
    * micro sums divided once, so the table is bit-reproducible in SQL —
    * this is what lets an IVF top-k built on it be EXACTLY oracled,
    * unlike the MLlib-seeded `Similarity.kmeansCentroids` (RNG init ⇒
    * spec-only tier). Cosine is scale-invariant, so the micro-scale
    * components rank identically to unit-scale ones — and bit-identically
    * on both engines, since each computes the same fold on the same
    * doubles. Scale shape: identical to [[fitStats]] (broadcast argmin +
    * one hash-agg per round); the export itself is k rows.
    */
  def fitCentroids(emb: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int): DataFrame = {
    val (_, centroids) = fit(emb, idCol, vecCol, k, iters)
    centroids.select(col("cluster_id"), col("m").as("cvec"))
  }

  /** DuckDB mirror of [[fitStats]]: the Lloyd rounds unrolled as CTE
    * pairs (aN = assignment, cN = centroid update), token-matched to the
    * Spark arithmetic.
    */
  def fitStatsOracleSql(table: String, idCol: String, vecCol: String,
                        k: Int, iters: Int, dim: Int): String =
    s"""WITH ${lloydCtes(table, idCol, vecCol, k, iters, dim)}
       |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |       CAST(SUM(CAST(round(d) AS BIGINT)) AS BIGINT) AS inertia_micro2
       |FROM a$iters GROUP BY 1""".stripMargin

  /** The shared Lloyd CTE chain (`v`, `c0`, `a1..c$iters`) — the WITH
    * body both [[fitStatsOracleSql]] and [[ivfTopKOracleSql]] build on.
    */
  private def lloydCtes(table: String, idCol: String, vecCol: String,
                        k: Int, iters: Int, dim: Int): String = {
    def distSql(mExpr: String): String =
      s"list_sum(list_transform(range(1, ${dim + 1}), " +
        s"i -> (CAST(q[i] AS DOUBLE) - $mExpr[i]) * (CAST(q[i] AS DOUBLE) - $mExpr[i])))"
    val rounds = (1 to iters).map { t =>
      val prev = if (t == 1) "c0" else s"c${t - 1}"
      s"""a$t AS (
         |  SELECT vec_id, cluster_id, d FROM (
         |    SELECT v.vec_id, c.cluster_id, ${distSql("c.m")} AS d,
         |           ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |             ORDER BY ${distSql("c.m")} ASC, c.cluster_id ASC) AS rn
         |    FROM v CROSS JOIN $prev c
         |  ) WHERE rn = 1
         |), u$t AS (
         |  SELECT a.cluster_id, i.i, SUM(v.q[i.i]) AS sx, count(*) AS cnt
         |  FROM a$t a JOIN v USING (vec_id)
         |  CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS i) i
         |  GROUP BY 1, 2
         |), c$t AS (
         |  SELECT cluster_id,
         |         list_transform(list(sx ORDER BY i), x -> CAST(x AS DOUBLE) / cnt0) AS m
         |  FROM (SELECT cluster_id, i, sx, MAX(cnt) OVER (PARTITION BY cluster_id) AS cnt0
         |        FROM u$t)
         |  GROUP BY cluster_id, cnt0
         |)""".stripMargin
    }.mkString(", ")
    s"""v AS (
       |  SELECT $idCol AS vec_id,
       |         list_transform(CAST($vecCol AS DOUBLE[]), x -> CAST(round(x * 1000000) AS BIGINT)) AS q
       |  FROM $table
       |), c0 AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cluster_id,
       |         list_transform(q, x -> CAST(x AS DOUBLE)) AS m
       |  FROM v WHERE vec_id < $k
       |), $rounds""".stripMargin
  }

  /** DuckDB mirror of `Similarity.ivfTopK` run over [[fitCentroids]]
    * output: the Lloyd chain above feeds `p` (the coarse-quantizer
    * table), then corpus/query assignment, probe-set selection, and the
    * in-list cosine ranking replay `Similarity.ivfRecallOracleSql`'s
    * argmax/probe/rank arithmetic exactly (same folds, same
    * `DESC NULLS LAST`, same `COALESCE(cos, -2.0)` zero-vector sentinel).
    */
  def ivfTopKOracleSql(table: String, idCol: String, vecCol: String,
                       kClusters: Int, iters: Int, dim: Int,
                       nprobe: Int, nQueries: Int, topK: Int): String = {
    def dotSql(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> $a[i] * $b[i]))"
    def cosSql(a: String, b: String): String =
      s"CASE WHEN sqrt(${dotSql(a, a)}) = 0 OR sqrt(${dotSql(b, b)}) = 0 THEN NULL " +
        s"ELSE ${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) END"
    s"""WITH ${lloydCtes(table, idCol, vecCol, kClusters, iters, dim)},
       |p AS (SELECT cluster_id, m AS ce FROM c$iters),
       |ve AS (SELECT $idCol AS vid, CAST($vecCol AS DOUBLE[]) AS e FROM $table),
       |qq AS (SELECT vid AS query_id, e AS qe FROM ve WHERE vid < $nQueries),
       |ca AS (
       |  SELECT vid AS neighbor_id, cluster_id, e AS cv FROM (
       |    SELECT c.vid, p.cluster_id, c.e,
       |      row_number() OVER (PARTITION BY c.vid
       |        ORDER BY COALESCE(${cosSql("c.e", "p.ce")}, -2.0) DESC NULLS LAST, p.cluster_id ASC) AS rn
       |    FROM ve c, p) WHERE rn = 1
       |),
       |qa AS (
       |  SELECT query_id, cluster_id, qe AS qv FROM (
       |    SELECT q.query_id, p.cluster_id, q.qe,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY COALESCE(${cosSql("q.qe", "p.ce")}, -2.0) DESC NULLS LAST, p.cluster_id ASC) AS rn
       |    FROM qq q, p) WHERE rn <= $nprobe
       |)
       |SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT qa.query_id, ca.neighbor_id, ${cosSql("qa.qv", "ca.cv")} AS cosine,
       |    row_number() OVER (PARTITION BY qa.query_id
       |      ORDER BY ${cosSql("qa.qv", "ca.cv")} DESC NULLS LAST, ca.neighbor_id ASC) AS rank
       |  FROM ca JOIN qa USING (cluster_id)
       |  WHERE qa.query_id <> ca.neighbor_id
       |) WHERE rank <= $topK""".stripMargin
  }
}
