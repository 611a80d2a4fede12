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

  /** Run `iters` Lloyd rounds; returns the final per-cluster readout
    * `(cluster_id, n_members, inertia_micro2)`.
    */
  def fitStats(emb: DataFrame, idCol: String, vecCol: String,
               k: Int, iters: Int): DataFrame = {
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
    assigned
      .groupBy("cluster_id")
      .agg(
        count(lit(1)).as("n_members"),
        sum(round(col("_d")).cast("long")).as("inertia_micro2"))
      .select(col("cluster_id"), col("n_members"), col("inertia_micro2"))
  }

  /** DuckDB mirror of [[fitStats]]: the Lloyd rounds unrolled as CTE
    * pairs (aN = assignment, cN = centroid update), token-matched to the
    * Spark arithmetic.
    */
  def fitStatsOracleSql(table: String, idCol: String, vecCol: String,
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
    s"""WITH v AS (
       |  SELECT $idCol AS vec_id,
       |         list_transform(CAST($vecCol AS DOUBLE[]), x -> CAST(round(x * 1000000) AS BIGINT)) AS q
       |  FROM $table
       |), c0 AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cluster_id,
       |         list_transform(q, x -> CAST(x AS DOUBLE)) AS m
       |  FROM v WHERE vec_id < $k
       |), $rounds
       |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |       CAST(SUM(CAST(round(d) AS BIGINT)) AS BIGINT) AS inertia_micro2
       |FROM a$iters GROUP BY 1""".stripMargin
  }
}
