package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-means-TRAINED product quantization — the real FAISS training path
  * (Jégou et al. 2011 run per subspace), composing [[Lloyd]]'s
  * exactly-oracled round structure with [[Quantized]]'s ADC scoring:
  * where `sim_pq_topk` uses raw data-point codebooks, this trains each
  * subspace's codebook with unrolled Lloyd rounds, encodes the corpus
  * under the TRAINED centroids, and answers queries by LUT/ADC against
  * those centroids. Every stage — per-subspace assignment argmins,
  * exact-integer centroid updates, the final encode, the LUT parts, the
  * subspace-ordered ADC fold, the top-k ranking — is mirrored in SQL,
  * so the full train→index→query loop is cross-engine-checked.
  *
  * Determinism contract (inherited from [[Lloyd]]):
  *   - vectors quantize to integer micros once; centroid means are one
  *     double division of exact long sums;
  *   - all distance/dot folds run left-to-right over the dimension axis,
  *     argmins tiebreak on cluster id, ADC folds in subspace order;
  *   - init = data-point pivots (`vid < kCodes`) per subspace.
  *
  * Scale shape: the centroid table is m×kCodes rows (broadcast every
  * round); assignment is a per-(row, subspace) argmin in one codegen'd
  * projection + a map-side-combining `min_by` aggregate; updates are one
  * (subspace, cluster, dim)-keyed hash-agg of exact longs. The subspace
  * axis rides INSIDE each round's frames (posexplode), so iters stays
  * the only sequential dimension — training 8 subspaces costs the same
  * number of Spark jobs as training one.
  */
object PqTrain {

  private def quantize(vecCol: Column): Column =
    transform(vecCol, x => round(x.cast("double") * 1000000.0).cast("long"))

  private def dist2(q: Column, mean: Column): Column =
    aggregate(
      zip_with(q, mean, (x, mm) => (x.cast("double") - mm) * (x.cast("double") - mm)),
      lit(0.0), (acc, v) => acc + v)

  private def dotQm(q: Column, mean: Column): Column =
    aggregate(
      zip_with(q, mean, (x, mm) => x.cast("double") * mm),
      lit(0.0), (acc, v) => acc + v)

  /** One row per (vid, subspace j): the j-th integer-micro sub-vector. */
  private def subRows(emb: DataFrame, idCol: String, vecCol: String,
                      m: Int, subDim: Int): DataFrame =
    emb.select(col(idCol).as("vid"), quantize(col(vecCol)).as("q"))
      .select(col("vid"),
        posexplode(array((0 until m).map(j => slice(col("q"), j * subDim + 1, subDim)): _*))
          .as(Seq("j", "qs")))

  /** Train per-subspace codebooks (`iters` Lloyd rounds) and encode the
    * corpus under the trained centroids. Returns (encoded, centroids):
    * encoded = (vid, j, cluster_id, d); centroids = (j, cluster_id, cm).
    */
  private def train(emb: DataFrame, idCol: String, vecCol: String,
                    dim: Int, m: Int, kCodes: Int, iters: Int): (DataFrame, DataFrame) = {
    require(dim % m == 0, s"PqTrain: dim=$dim not divisible by m=$m")
    require(kCodes > 0 && iters > 0, "PqTrain needs kCodes > 0, iters > 0")
    val subDim = dim / m
    val sub = subRows(emb, idCol, vecCol, m, subDim)
    var cent = sub.filter(col("vid") < kCodes)
      .select(col("j"), col("vid").cast("int").as("cluster_id"),
        transform(col("qs"), x => x.cast("double")).as("cm"))
    def assign(c: DataFrame): DataFrame =
      sub.join(broadcast(c), Seq("j"))
        .withColumn("_d", dist2(col("qs"), col("cm")))
        .groupBy("vid", "j")
        .agg(min_by(struct(col("cluster_id"), col("_d")),
          struct(col("_d"), col("cluster_id"))).as("_b"))
        .select(col("vid"), col("j"), col("_b.cluster_id").as("cluster_id"),
          col("_b._d").as("d"))
    for (_ <- 1 to iters) {
      val assigned = assign(cent)
      val sums = assigned.join(sub, Seq("vid", "j"))
        .select(col("j"), col("cluster_id"), posexplode(col("qs")).as(Seq("pos", "x")))
        .groupBy("j", "cluster_id", "pos")
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
      cent = sums
        .groupBy("j", "cluster_id")
        .agg(
          transform(array_sort(collect_list(struct(col("pos"), col("sx")))),
            s => s.getField("sx")).as("_s"),
          max(col("cnt")).as("_n"))
        .select(col("j"), col("cluster_id"),
          transform(col("_s"), x => x.cast("double") / col("_n")).as("cm"))
    }
    // materialize the trained codebook ONCE as a local m×kCodes-row table
    // (128 rows at the registry config). Without this, a consumer that
    // references the centroids twice — trainedTopK's encode side AND its
    // query-LUT side — embeds the whole iterated training subtree twice
    // in one plan and EXECUTES the training twice per action (measured:
    // sim_pqtrain_topk 3.3 s → ~1.6 s). The collect is the session-memo
    // pattern at its smallest: lineage truncation on a table whose size
    // is a parameter product, never data-dependent.
    val s = emb.sparkSession
    val centLocal = s.createDataFrame(
      s.sparkContext.parallelize(cent.collect().toSeq, 1), cent.schema)
    (assign(centLocal), centLocal) // final assignment = the encode
  }

  /** Training diagnostics: per (subspace, trained cluster) member count
    * and exact-integer inertia of the FINAL encode.
    */
  def trainStats(emb: DataFrame, idCol: String, vecCol: String,
                 dim: Int, m: Int, kCodes: Int, iters: Int): DataFrame = {
    val (encoded, _) = train(emb, idCol, vecCol, dim, m, kCodes, iters)
    encoded
      .groupBy("j", "cluster_id")
      .agg(count(lit(1)).as("n_members"),
        sum(round(col("d")).cast("long")).as("inertia_micro2"))
      .select(col("j"), col("cluster_id"), col("n_members"), col("inertia_micro2"))
  }

  /** ADC top-k under the TRAINED codebooks: queries build an
    * (m × kCodes) LUT of sub-vector · centroid dots, candidates score by
    * summing their codes' LUT entries in subspace order.
    * Output: (query_id, neighbor_id, adc, rank).
    */
  def trainedTopK(emb: DataFrame, idCol: String, vecCol: String,
                  dim: Int, m: Int, kCodes: Int, iters: Int,
                  nQueries: Int, k: Int): DataFrame = {
    val subDim = dim / m
    val (encoded, cent) = train(emb, idCol, vecCol, dim, m, kCodes, iters)
    val lut = subRows(emb.filter(col(idCol) < nQueries), idCol, vecCol, m, subDim)
      .withColumnRenamed("vid", "query_id")
      .join(broadcast(cent), Seq("j"))
      .withColumn("part", dotQm(col("qs"), col("cm")))
      .select(col("query_id"), col("j"), col("cluster_id").as("c"), col("part"))
    val scoredW = Window.partitionBy("query_id").orderBy(desc("adc"), asc("vid"))
    encoded
      .join(broadcast(lut),
        encoded("j") === lut("j") && encoded("cluster_id") === lut("c"))
      .groupBy(col("query_id"), col("vid"))
      .agg(aggregate(
        array_sort(collect_list(struct(encoded("j"), col("part")))),
        lit(0.0), (acc, s) => acc + s.getField("part")).as("adc"))
      .filter(col("query_id") =!= col("vid"))
      .withColumn("rank", row_number().over(scoredW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vid").as("neighbor_id"), col("adc"), col("rank"))
  }

  /** The training chain as CTEs ending in `enc(vid, j, cluster_id, d)`
    * and `ct$iters(j, cluster_id, cm)` — token-matched to [[train]].
    */
  private def trainCtes(table: String, idCol: String, vecCol: String,
                        dim: Int, m: Int, kCodes: Int, iters: Int): String = {
    val subDim = dim / m
    def distSql(qs: String, cm: String): String =
      s"list_sum(list_transform(range(1, ${subDim + 1}), " +
        s"i -> (CAST($qs[i] AS DOUBLE) - $cm[i]) * (CAST($qs[i] AS DOUBLE) - $cm[i])))"
    def assignSql(name: String, from: String): String =
      s"""$name AS (
         |  SELECT vid, j, cluster_id, d FROM (
         |    SELECT s.vid, s.j, c.cluster_id, ${distSql("s.qs", "c.cm")} AS d,
         |      ROW_NUMBER() OVER (PARTITION BY s.vid, s.j
         |        ORDER BY ${distSql("s.qs", "c.cm")} ASC, c.cluster_id ASC) AS rn
         |    FROM sub s JOIN $from c ON s.j = c.j
         |  ) WHERE rn = 1
         |)""".stripMargin
    val rounds = (1 to iters).map { t =>
      s"""${assignSql(s"a$t", s"ct${t - 1}")}, u$t AS (
         |  SELECT a.j, a.cluster_id, i.i, SUM(s.qs[i.i]) AS sx, count(*) AS cnt
         |  FROM a$t a JOIN sub s ON a.vid = s.vid AND a.j = s.j
         |  CROSS JOIN (SELECT unnest(range(1, ${subDim + 1})) AS i) i
         |  GROUP BY 1, 2, 3
         |), ct$t AS (
         |  SELECT j, cluster_id,
         |         list_transform(list(sx ORDER BY i), x -> CAST(x AS DOUBLE) / cnt0) AS cm
         |  FROM (SELECT j, cluster_id, i, sx,
         |               MAX(cnt) OVER (PARTITION BY j, cluster_id) AS cnt0
         |        FROM u$t)
         |  GROUP BY j, cluster_id, cnt0
         |)""".stripMargin
    }.mkString(", ")
    s"""v AS (
       |  SELECT $idCol AS vid,
       |         list_transform(CAST($vecCol AS DOUBLE[]), x -> CAST(round(x * 1000000) AS BIGINT)) AS q
       |  FROM $table
       |), sub AS MATERIALIZED (
       |  SELECT vid, j, list_transform(range(1, ${subDim + 1}), i -> q[j * $subDim + i]) AS qs
       |  FROM v CROSS JOIN (SELECT unnest(range(0, $m)) AS j)
       |), ct0 AS (
       |  SELECT j, CAST(vid AS INTEGER) AS cluster_id,
       |         list_transform(qs, x -> CAST(x AS DOUBLE)) AS cm
       |  FROM sub WHERE vid < $kCodes
       |), $rounds, ${assignSql("enc", s"ct$iters")}""".stripMargin
  }

  /** DuckDB mirror of [[trainStats]]. */
  def trainStatsOracleSql(table: String, idCol: String, vecCol: String,
                          dim: Int, m: Int, kCodes: Int, iters: Int): String =
    s"""WITH ${trainCtes(table, idCol, vecCol, dim, m, kCodes, iters)}
       |SELECT j, cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |       CAST(SUM(CAST(round(d) AS BIGINT)) AS BIGINT) AS inertia_micro2
       |FROM enc GROUP BY 1, 2""".stripMargin

  /** DuckDB mirror of [[trainedTopK]] — same trained centroids, same
    * subspace-ordered ADC fold, same (adc DESC, id ASC) ranking.
    */
  def trainedTopKOracleSql(table: String, idCol: String, vecCol: String,
                           dim: Int, m: Int, kCodes: Int, iters: Int,
                           nQueries: Int, k: Int): String = {
    val subDim = dim / m
    val dotSql =
      s"list_sum(list_transform(range(1, ${subDim + 1}), " +
        s"i -> CAST(s.qs[i] AS DOUBLE) * c.cm[i]))"
    s"""WITH ${trainCtes(table, idCol, vecCol, dim, m, kCodes, iters)},
       |lut AS (
       |  SELECT s.vid AS query_id, s.j, c.cluster_id AS c, $dotSql AS part
       |  FROM sub s JOIN ct$iters c ON s.j = c.j WHERE s.vid < $nQueries
       |), adc AS (
       |  SELECT l.query_id, e.vid AS neighbor_id,
       |         list_sum(list(l.part ORDER BY l.j)) AS adc
       |  FROM enc e JOIN lut l ON e.j = l.j AND e.cluster_id = l.c
       |  GROUP BY 1, 2
       |)
       |SELECT query_id, neighbor_id, adc, rank FROM (
       |  SELECT query_id, neighbor_id, adc,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc DESC NULLS LAST, neighbor_id ASC) AS rank
       |  FROM adc WHERE query_id <> neighbor_id
       |) WHERE rank <= $k""".stripMargin
  }
}
