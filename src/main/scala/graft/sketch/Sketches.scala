package graft.sketch

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable probabilistic sketches AS RELATIONS — count-min, KMV distinct,
  * blocked bloom membership.
  *
  * Spark ships HLL++ / CountMinSketch / BloomFilter aggregates, but their
  * hash functions are engine-private: the sketch VALUES can't be checked
  * against another engine, only trusted (the `a2_approx_distinct` /
  * BloomJoin tier). These operators instead build the sketch from the
  * repo's engine-portable 60-bit md5 primitive ([[TextOps.md5Hash60]]),
  * so the whole sketch — every cell, the kth order statistic, every set
  * bit — is reproducible in DuckDB and the estimate quality lands in
  * CORRECTNESS as a hash-checked row, not a spec promise.
  *
  * Scale shape: a sketch is by construction CARDINALITY-BOUNDED (d×w
  * cells, k hashes, m bits) while its input is data-sized. Every build
  * here is explode → hash-aggregate, so partial aggregation collapses
  * each input partition to at most the sketch size before the exchange —
  * the shuffle moves O(sketch), never O(data). Probes join against the
  * broadcast sketch. That is exactly how a 100 TB corpus summarizes into
  * a few KB without a driver-side accumulator.
  *
  * Semantics follow the reference's profiling/dedup needs (distinct
  * counts, frequent items, membership pre-filters); the sketch algebra is
  * the textbook form (Cormode–Muthukrishnan CMS; Bar-Yossef et al. KMV;
  * Bloom 1970).
  */
object Sketches {

  /** hash_j(item) in [0, width): the row-j bucket of `item`. */
  private def bucket(item: Column, j: Column, salt: String, width: Long): Column =
    pmod(TextOps.md5Hash60(concat(item, lit(salt), j.cast("string"))), lit(width))

  private def bucketSql(itemSql: String, jSql: String, salt: String, width: Long): String =
    s"CAST(concat('0x', substr(md5(concat($itemSql, '$salt', CAST($jSql AS VARCHAR))), 1, 15)) AS BIGINT) % $width"

  // ------------------------------------------------------------------
  // Count-min sketch
  // ------------------------------------------------------------------

  /** Build the (depth × width) count-min table from an item column:
    * one row per non-empty cell, `(j, bucket, cnt)`. Each input row
    * explodes into `depth` hash rows, but map-side combine bounds the
    * exchange at depth×width cells per partition.
    */
  def cmsBuild(items: DataFrame, itemCol: String,
               depth: Int = 4, width: Long = 256L, salt: String = ":cms"): DataFrame =
    items
      .select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .select(col("item"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .groupBy(col("j"), bucket(col("item"), col("j"), salt, width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-query the sketch for every distinct probe item:
    * `est = min_j cms[j][h_j(item)]` (0 when a cell is empty — the item
    * was never observed under that hash row). CMS guarantees
    * `est >= true_count`; the overestimate is what the declared query
    * surfaces next to the exact count.
    */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, itemCol: String,
                  depth: Int = 4, width: Long = 256L, salt: String = ":cms"): DataFrame =
    probes
      .select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .distinct()
      .select(col("item"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("bucket", bucket(col("item"), col("j"), salt, width))
      // the sketch is d×w rows no matter the input scale — broadcast it
      .join(broadcast(cms), Seq("j", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))

  /** DuckDB mirror of build+estimate joined to the exact counts:
    * `(item, exact_cnt, cms_est)`. `itemsSql` must yield one column
    * `item` (string). */
  def cmsOracleSql(itemsSql: String, depth: Int = 4, width: Long = 256L,
                   salt: String = ":cms"): String = {
    val js = (0 until depth).mkString(", ")
    s"""WITH items AS ($itemsSql),
       |jj AS (SELECT unnest([$js]) AS j),
       |cms AS (
       |  SELECT j, ${bucketSql("item", "j", salt, width)} AS bucket, count(*) AS cnt
       |  FROM items CROSS JOIN jj GROUP BY 1, 2
       |),
       |exact AS (SELECT item, CAST(count(*) AS BIGINT) AS exact_cnt FROM items GROUP BY 1),
       |est AS (
       |  SELECT e.item, min(coalesce(c.cnt, 0)) AS cms_est
       |  FROM exact e CROSS JOIN jj
       |  LEFT JOIN cms c
       |    ON c.j = jj.j AND c.bucket = ${bucketSql("e.item", "jj.j", salt, width)}
       |  GROUP BY 1
       |)
       |SELECT e.item, e.exact_cnt, CAST(s.cms_est AS BIGINT) AS cms_est
       |FROM exact e JOIN est s ON e.item = s.item""".stripMargin
  }

  /** Merge count-min tables cell-wise (sum per (j, bucket)) — CMS is a
    * linear sketch, so the merge of per-shard sketches EQUALS the sketch
    * of the whole stream. That algebra is what makes a sketch usable at
    * 100 TB: each executor summarizes its shard, and the reduce combines
    * d×w cells, never rows.
    */
  def cmsMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("j", "bucket")
      .agg(sum(col("cnt")).as("cnt"))

  /** DuckDB mirror of the merge-equals-whole check: `itemsSql` yields
    * `(shard, item)` with shard ∈ {0, 1}; the oracle builds the two
    * shard sketches, merges cell-wise, and compares against the
    * whole-stream build — `(n_cells, n_mismatch)` with n_mismatch
    * provably 0. */
  def cmsMergeOracleSql(itemsSql: String, depth: Int = 4, width: Long = 256L,
                        salt: String = ":cms"): String = {
    val js = (0 until depth).mkString(", ")
    s"""WITH items AS ($itemsSql),
       |jj AS (SELECT unnest([$js]) AS j),
       |full_ AS (
       |  SELECT j, ${bucketSql("item", "j", salt, width)} AS bucket, count(*) AS cnt
       |  FROM items CROSS JOIN jj GROUP BY 1, 2
       |),
       |shards AS (
       |  SELECT shard, j, ${bucketSql("item", "j", salt, width)} AS bucket, count(*) AS cnt
       |  FROM items CROSS JOIN jj GROUP BY 1, 2, 3
       |),
       |merged AS (SELECT j, bucket, sum(cnt) AS cnt FROM shards GROUP BY 1, 2)
       |SELECT CAST(count(*) AS BIGINT) AS n_cells,
       |       CAST(sum(CASE WHEN coalesce(f.cnt, -1) <> coalesce(m.cnt, -1)
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
       |FROM full_ f FULL OUTER JOIN merged m USING (j, bucket)""".stripMargin
  }

  // ------------------------------------------------------------------
  // KMV distinct-count sketch
  // ------------------------------------------------------------------

  /** k-minimum-values distinct estimate: hash every key into [0, 2^60),
    * keep the k smallest DISTINCT hashes, estimate
    * `D ≈ (k-1) · 2^60 / h_(k)`. One row:
    * `(exact_distinct, kth_hash, kmv_est)` — the estimate next to the
    * truth, both engine-portable (all-double arithmetic, identical op
    * order). The k-smallest funnel is a TakeOrdered over k values, not a
    * global sort.
    */
  def kmvDistinct(df: DataFrame, keyCol: String, k: Int = 64,
                  salt: String = ":kmv"): DataFrame = {
    val hashes = df
      .select(TextOps.md5Hash60(concat(col(keyCol).cast("string"), lit(salt))).as("h"))
      .distinct()
    val kth = hashes.orderBy(col("h")).limit(k).agg(max(col("h")).as("kth_hash"))
    val exact = df.agg(countDistinct(col(keyCol)).as("exact_distinct"))
    exact.crossJoin(kth).select(
      col("exact_distinct"),
      col("kth_hash"),
      (lit((k - 1).toDouble) * lit(1152921504606846976L).cast("double") /
        col("kth_hash").cast("double")).as("kmv_est"))
  }

  /** DuckDB mirror of [[kmvDistinct]]; `keySql` is the key expression,
    * `fromSql` the FROM clause body. */
  def kmvOracleSql(keySql: String, fromSql: String, k: Int = 64,
                   salt: String = ":kmv"): String =
    s"""WITH h AS (
       |  SELECT DISTINCT CAST(concat('0x', substr(md5(concat(CAST($keySql AS VARCHAR), '$salt')), 1, 15)) AS BIGINT) AS h
       |  FROM $fromSql
       |),
       |kth AS (SELECT max(h) AS kth_hash FROM (SELECT h FROM h ORDER BY h LIMIT $k)),
       |ex AS (SELECT CAST(count(DISTINCT $keySql) AS BIGINT) AS exact_distinct FROM $fromSql)
       |SELECT ex.exact_distinct, kth.kth_hash,
       |       CAST(${k - 1} AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
       |         / CAST(kth.kth_hash AS DOUBLE) AS kmv_est
       |FROM ex CROSS JOIN kth""".stripMargin

  /** KMV MERGEABILITY as data — the distinct-count analog of
    * [[cmsMerge]]'s linearity row: each shard keeps only its k smallest
    * distinct hashes, the shard sketches union and re-truncate to k, and
    * the merged k-th minimum must equal the whole-stream k-th minimum
    * EXACTLY (the global k-th smallest hash lives inside some shard's
    * top-k, so truncation loses nothing). This is the property that lets
    * executors sketch shards independently and the reduce combine k-sized
    * sets, never rows. Output one row:
    * `(n_shards, kth_hash_full, kth_hash_merged, n_mismatch)` with
    * n_mismatch = 0 hash-checked.
    */
  def kmvMerge(df: DataFrame, keyCol: String, k: Int = 64, shards: Int = 8,
               salt: String = ":kmv", shardSalt: String = ":kshard"): DataFrame = {
    val hashed = df.select(
      TextOps.md5Hash60(concat(col(keyCol).cast("string"), lit(salt))).as("h"),
      pmod(TextOps.md5Hash60(concat(col(keyCol).cast("string"), lit(shardSalt))),
        lit(shards.toLong)).as("shard"))
    // whole-stream k-th minimum over distinct hashes
    val kthFull = hashed.select("h").distinct()
      .orderBy(col("h")).limit(k).agg(max(col("h")).as("kth_hash_full"))
    // per-shard k smallest distinct hashes → union → re-truncate to k
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("h"))
    val shardTopK = hashed.distinct()
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select("h").distinct() // a hash may appear in several shards' sets
    val kthMerged = shardTopK
      .orderBy(col("h")).limit(k).agg(max(col("h")).as("kth_hash_merged"))
    kthFull.crossJoin(kthMerged).select(
      lit(shards.toLong).as("n_shards"),
      col("kth_hash_full"), col("kth_hash_merged"),
      when(col("kth_hash_full") === col("kth_hash_merged"), 0L).otherwise(1L)
        .as("n_mismatch"))
  }

  /** DuckDB mirror of [[kmvMerge]]. */
  def kmvMergeOracleSql(keySql: String, fromSql: String, k: Int = 64,
                        shards: Int = 8, salt: String = ":kmv",
                        shardSalt: String = ":kshard"): String = {
    def h60(s: String, slt: String) =
      s"CAST(concat('0x', substr(md5(concat(CAST($s AS VARCHAR), '$slt')), 1, 15)) AS BIGINT)"
    s"""WITH hs AS (
       |  SELECT ${h60(keySql, salt)} AS h,
       |         ${h60(keySql, shardSalt)} % $shards AS shard
       |  FROM $fromSql
       |),
       |kf AS (SELECT max(h) AS kth_hash_full
       |       FROM (SELECT h FROM (SELECT DISTINCT h FROM hs) ORDER BY h LIMIT $k)),
       |st AS (
       |  SELECT DISTINCT h FROM (
       |    SELECT h, row_number() OVER (PARTITION BY shard ORDER BY h) AS rn
       |    FROM (SELECT DISTINCT h, shard FROM hs)
       |  ) WHERE rn <= $k
       |),
       |km AS (SELECT max(h) AS kth_hash_merged
       |       FROM (SELECT h FROM st ORDER BY h LIMIT $k))
       |SELECT CAST($shards AS BIGINT) AS n_shards,
       |       kf.kth_hash_full, km.kth_hash_merged,
       |       CASE WHEN kf.kth_hash_full = km.kth_hash_merged
       |            THEN CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS n_mismatch
       |FROM kf CROSS JOIN km""".stripMargin
  }

  // ------------------------------------------------------------------
  // Bloom membership
  // ------------------------------------------------------------------

  /** Portable bloom filter as a SET-BIT RELATION: `numHashes` positions
    * per member in [0, bits), distinct — at most `bits` rows regardless
    * of member count. A probe "hits" iff all `numHashes` of its positions
    * are set. Returns the accounting row the declared query emits:
    * `(n_probes, n_true_members, n_bloom_hits, n_false_pos)` — bloom's
    * contract (zero false negatives, bounded false-positive rate) as
    * checkable numbers.
    *
    * The bit relation broadcasts (≤ `bits` longs); the probe side never
    * shuffles — membership is a broadcast join + a count-distinct-j
    * aggregate per probe key.
    */
  def bloomMembership(members: DataFrame, memberCol: String,
                      probes: DataFrame, probeCol: String,
                      bits: Long = 4096L, numHashes: Int = 3,
                      salt: String = ":bf"): DataFrame = {
    // same portable position formula as the CMS bucket — one definition
    // (bucket/bucketSql) feeds both sketch families and their oracles
    def positions(c: Column, j: Column): Column = bucket(c, j, salt, bits)
    val bitRows = members
      .select(col(memberCol).cast("string").as("mk"))
      .filter(col("mk").isNotNull)
      .select(col("mk"), explode(sequence(lit(0), lit(numHashes - 1))).as("j"))
      .select(positions(col("mk"), col("j")).as("pos"))
      .distinct()
    val probeKeys = probes
      .select(col(probeCol).cast("string").as("pk"))
      .filter(col("pk").isNotNull)
      .distinct()
    val hits = probeKeys
      .select(col("pk"), explode(sequence(lit(0), lit(numHashes - 1))).as("j"))
      .withColumn("pos", positions(col("pk"), col("j")))
      .join(broadcast(bitRows), Seq("pos"))
      .groupBy("pk")
      .agg(countDistinct(col("j")).as("nj"))
      .filter(col("nj") === numHashes)
    val trueMembers = probeKeys.join(
      members.select(col(memberCol).cast("string").as("pk")).distinct(), Seq("pk"), "left_semi")
    probeKeys.agg(count(lit(1)).as("n_probes"))
      .crossJoin(trueMembers.agg(count(lit(1)).as("n_true_members")))
      .crossJoin(hits.agg(count(lit(1)).as("n_bloom_hits")))
      .select(col("n_probes"), col("n_true_members"), col("n_bloom_hits"),
        (col("n_bloom_hits") - col("n_true_members")).as("n_false_pos"))
  }

  /** DuckDB mirror of [[bloomMembership]]. `memberSql`/`probeSql` yield
    * one string column `k`. Bloom has no false negatives under this
    * construction (same hash both sides), so false positives are
    * `hits - true`. */
  def bloomOracleSql(memberSql: String, probeSql: String,
                     bits: Long = 4096L, numHashes: Int = 3,
                     salt: String = ":bf"): String = {
    val js = (0 until numHashes).mkString(", ")
    s"""WITH members AS ($memberSql),
       |probes AS (SELECT DISTINCT k FROM ($probeSql)),
       |jj AS (SELECT unnest([$js]) AS j),
       |bits AS (
       |  SELECT DISTINCT ${bucketSql("k", "j", salt, bits)} AS pos
       |  FROM (SELECT DISTINCT k FROM members) CROSS JOIN jj
       |),
       |hits AS (
       |  SELECT p.k
       |  FROM probes p CROSS JOIN jj
       |  JOIN bits b ON b.pos = ${bucketSql("p.k", "jj.j", salt, bits)}
       |  GROUP BY p.k HAVING count(DISTINCT jj.j) = $numHashes
       |)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM probes) AS n_probes,
       |       (SELECT CAST(count(*) AS BIGINT) FROM probes WHERE k IN (SELECT k FROM members)) AS n_true_members,
       |       (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_bloom_hits,
       |       (SELECT CAST(count(*) AS BIGINT) FROM hits)
       |         - (SELECT CAST(count(*) AS BIGINT) FROM probes WHERE k IN (SELECT k FROM members)) AS n_false_pos""".stripMargin
  }

  // ------------------------------------------------------------------
  // KMV set intersection
  // ------------------------------------------------------------------

  /** KMV SET-INTERSECTION estimate — the sketch algebra that answers
    * "how many users are in BOTH segments" without ever joining the raw
    * sets: each side keeps its k smallest distinct hashes, the union
    * sketch is the k smallest of K_A ∪ K_B, and with
    * ρ = |{h ∈ U_k : h ∈ K_A ∧ h ∈ K_B}| / k (the Jaccard estimate over
    * the union sketch's uniform sample), the intersection estimate is
    * ρ · D̂(U) with D̂ the standard KMV distinct estimator. Everything
    * after the two k-sized TakeOrdered funnels is k-row arithmetic —
    * at scale the raw sets never co-shuffle.
    *
    * Output one row: `(exact_intersect, kth_union, overlap_k,
    * kmv_intersect_est)` — the estimate beside the truth, both
    * engine-portable (all-double arithmetic, identical op order).
    */
  def kmvIntersect(dfA: DataFrame, keyColA: String,
                   dfB: DataFrame, keyColB: String,
                   k: Int = 64, salt: String = ":kmv"): DataFrame = {
    def hashes(df: DataFrame, c: String) = df
      .select(TextOps.md5Hash60(concat(col(c).cast("string"), lit(salt))).as("h"))
      .distinct()
    val kA = hashes(dfA, keyColA).orderBy(col("h")).limit(k)
    val kB = hashes(dfB, keyColB).orderBy(col("h")).limit(k)
    val uK = kA.union(kB).distinct().orderBy(col("h")).limit(k)
    // tag membership of each union-sketch hash in both side sketches —
    // k-row broadcast joins, then one k-row aggregate
    val tagged = uK
      .join(kA.withColumn("_in_a", lit(1L)), Seq("h"), "left")
      .join(kB.withColumn("_in_b", lit(1L)), Seq("h"), "left")
    val stats = tagged.agg(
      max(col("h")).as("kth_union"),
      sum(when(col("_in_a") === 1L && col("_in_b") === 1L, 1L).otherwise(0L))
        .as("overlap_k"))
    val exact = dfA.select(col(keyColA).cast("string").as("k"))
      .intersect(dfB.select(col(keyColB).cast("string").as("k")))
      .agg(count(lit(1)).as("exact_intersect"))
    exact.crossJoin(stats).select(
      col("exact_intersect"), col("kth_union"), col("overlap_k"),
      (col("overlap_k").cast("double") / lit(k.toDouble) *
        (lit((k - 1).toDouble) * lit(1152921504606846976L).cast("double") /
          col("kth_union").cast("double"))).as("kmv_intersect_est"))
  }

  /** DuckDB mirror of [[kmvIntersect]]; `aSql`/`bSql` produce one `k`
    * column of set members each. */
  def kmvIntersectOracleSql(aSql: String, bSql: String,
                            k: Int = 64, salt: String = ":kmv"): String = {
    def h60 = (src: String) =>
      s"""SELECT DISTINCT CAST(concat('0x', substr(md5(concat(CAST(k AS VARCHAR), '$salt')), 1, 15)) AS BIGINT) AS h
         |  FROM ($src)""".stripMargin
    s"""WITH ka AS (SELECT h FROM (${h60(aSql)}) ORDER BY h LIMIT $k),
       |kb AS (SELECT h FROM (${h60(bSql)}) ORDER BY h LIMIT $k),
       |uk AS (SELECT h FROM (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb))
       |       ORDER BY h LIMIT $k),
       |st AS (
       |  SELECT max(uk.h) AS kth_union,
       |         CAST(SUM(CASE WHEN uk.h IN (SELECT h FROM ka)
       |                        AND uk.h IN (SELECT h FROM kb) THEN 1 ELSE 0 END) AS BIGINT)
       |           AS overlap_k
       |  FROM uk
       |),
       |ex AS (
       |  SELECT CAST(count(*) AS BIGINT) AS exact_intersect FROM (
       |    SELECT CAST(k AS VARCHAR) AS k FROM ($aSql)
       |    INTERSECT
       |    SELECT CAST(k AS VARCHAR) AS k FROM ($bSql)
       |  )
       |)
       |SELECT ex.exact_intersect, st.kth_union, st.overlap_k,
       |       CAST(st.overlap_k AS DOUBLE) / CAST($k AS DOUBLE) *
       |         (CAST(${k - 1} AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
       |           / CAST(st.kth_union AS DOUBLE)) AS kmv_intersect_est
       |FROM ex CROSS JOIN st""".stripMargin
  }

  // ------------------------------------------------------------------
  // Equi-width histogram quantile sketch
  // ------------------------------------------------------------------

  /** B-cell equi-width histogram of a numeric column (grid = [min, max]
    * from one broadcast agg) — the quantile member of the sketch family.
    * Deterministic (no reservoir, no RNG), cell-wise MERGEABLE like CMS
    * (shards over the shared grid sum to the whole-stream build), and
    * cardinality-bounded: the exchange moves ≤ B cells per partition.
    */
  private def histogram(base: DataFrame, mm: DataFrame, buckets: Int): DataFrame =
    base.crossJoin(broadcast(mm))
      .select(
        when(col("_hi") === col("_lo"), lit(0L))
          .otherwise(least(
            floor((col("_v") - col("_lo")) / ((col("_hi") - col("_lo")) / buckets)),
            lit((buckets - 1).toLong)))
          .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  private def histBase(df: DataFrame, valueCol: String): (DataFrame, DataFrame) = {
    val base = df.select(col(valueCol).cast("double").as("_v"))
      .filter(col("_v").isNotNull)
    (base, base.agg(min("_v").as("_lo"), max("_v").as("_hi")))
  }

  /** Histogram quantile estimates NEXT TO the exact order statistics —
    * `(p_permille, est, exact, abs_err)` — so the sketch's error is data,
    * not a claim (the sk_cms_err pattern). The estimate interpolates
    * linearly inside the first cell whose cumulative count covers the
    * integer target `⌈p·n/1000⌉`; the exact value is the smallest v with
    * `1000·cum(v) ≥ p·n`, computed over per-value counts through the
    * RunningTotal distributed CDF (no data-sized one-task window — the
    * only unpartitioned window here runs over the ≤ B histogram cells,
    * bounded by the SKETCH, not the data).
    */
  def histQuantiles(df: DataFrame, valueCol: String, buckets: Int,
                    psPermille: Seq[Int]): DataFrame = {
    require(buckets > 0 && psPermille.nonEmpty &&
      psPermille.forall(p => p > 0 && p <= 1000), "bad histQuantiles params")
    val spark = df.sparkSession
    import spark.implicits._
    val (base, mm) = histBase(df, valueCol)
    val hist = histogram(base, mm, buckets)
    val wc = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum("cnt").over(wc))
    val nRow = hist.agg(sum(col("cnt")).as("_n"))
    val ps = psPermille.toDF("p_permille")
    // first covering cell per p (≤ B·|ps| rows in flight)
    val sel = cum.crossJoin(broadcast(nRow)).crossJoin(broadcast(ps))
      .filter(col("cum") * 1000 >= col("p_permille") * col("_n"))
      .groupBy("p_permille").agg(min(col("bucket")).as("bucket"))
    val est = sel.join(cum, "bucket").crossJoin(broadcast(nRow)).crossJoin(broadcast(mm))
      .withColumn("_target", expr("CAST((p_permille * _n + 999) DIV 1000 AS BIGINT)"))
      .select(col("p_permille"),
        round(col("_lo") + (col("_hi") - col("_lo")) / buckets *
          (col("bucket") + (col("_target") - (col("cum") - col("cnt"))).cast("double") /
            col("cnt")), 6).as("est"))
    // exact order statistics via the distributed CDF over per-value counts
    val perVal = base.groupBy(col("_v")).agg(count(lit(1)).as("_c"))
    val (cumVal, nTot) = graft.ops.RunningTotal.withRunningSum(
      perVal, col("_c"), "_cumv", col("_v").asc)
    val exact = cumVal.crossJoin(broadcast(nTot)).crossJoin(broadcast(ps))
      .filter(col("_cumv") * 1000 >= col("p_permille") * col("_rt_total"))
      .groupBy("p_permille").agg(min(col("_v")).as("exact"))
    est.join(exact, "p_permille")
      .select(col("p_permille").cast("int").as("p_permille"), col("est"),
        col("exact"), round(abs(col("est") - col("exact")), 6).as("abs_err"))
  }

  /** Merge-equals-whole check for the histogram sketch: shard histograms
    * over the SHARED grid, summed cell-wise, must equal the whole-stream
    * build exactly — `(n_cells, n_mismatch)` with n_mismatch provably 0
    * (the linearity that lets executors histogram shards independently).
    */
  def histMergeCheck(df: DataFrame, valueCol: String, shard: Column,
                     buckets: Int): DataFrame = {
    val withShard = df.select(col(valueCol).cast("double").as("_v"), shard.as("_shard"))
      .filter(col("_v").isNotNull)
    val mm = withShard.agg(min("_v").as("_lo"), max("_v").as("_hi"))
    val full = histogram(withShard, mm, buckets)
    val merged = withShard.crossJoin(broadcast(mm))
      .select(col("_shard"),
        when(col("_hi") === col("_lo"), lit(0L))
          .otherwise(least(
            floor((col("_v") - col("_lo")) / ((col("_hi") - col("_lo")) / buckets)),
            lit((buckets - 1).toLong)))
          .as("bucket"))
      .groupBy("_shard", "bucket").agg(count(lit(1)).as("cnt"))
      .groupBy("bucket").agg(sum(col("cnt")).as("cnt"))
    full.withColumnRenamed("cnt", "cnt_full")
      .join(merged.withColumnRenamed("cnt", "cnt_merged"), Seq("bucket"), "full_outer")
      .agg(
        count(lit(1)).as("n_cells"),
        sum(when(coalesce(col("cnt_full"), lit(-1L)) =!=
          coalesce(col("cnt_merged"), lit(-1L)), 1L).otherwise(0L)).as("n_mismatch"))
  }

  /** DuckDB mirror of [[histQuantiles]]. */
  def histQuantilesOracleSql(table: String, valueSql: String, buckets: Int,
                             psPermille: Seq[Int]): String = {
    val psRows = psPermille.map(p => s"($p)").mkString(", ")
    s"""WITH b AS (
       |  SELECT CAST($valueSql AS DOUBLE) AS v FROM $table WHERE $valueSql IS NOT NULL
       |), mm AS (SELECT min(v) AS lo, max(v) AS hi FROM b),
       |hist AS (
       |  SELECT CASE WHEN hi = lo THEN 0
       |              ELSE CAST(least(floor((v - lo) / ((hi - lo) / $buckets)), ${buckets - 1}) AS BIGINT)
       |         END AS bucket, count(*) AS cnt
       |  FROM b, mm GROUP BY 1
       |), cum AS (
       |  SELECT bucket, cnt, CAST(SUM(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum
       |  FROM hist
       |), nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hist),
       |ps(p_permille) AS (VALUES $psRows),
       |sel AS (
       |  SELECT p_permille, min(bucket) AS bucket
       |  FROM cum, nn, ps WHERE cum * 1000 >= p_permille * n GROUP BY 1
       |), est AS (
       |  SELECT p_permille,
       |         round(lo + (hi - lo) / $buckets *
       |           (c.bucket + CAST((p_permille * n + 999) // 1000 - (c.cum - c.cnt) AS DOUBLE)
       |             / c.cnt), 6) AS est
       |  FROM sel s JOIN cum c ON s.bucket = c.bucket, mm, nn
       |), pv AS (SELECT v, count(*) AS c FROM b GROUP BY 1),
       |pc AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cumv FROM pv),
       |ex AS (
       |  SELECT p_permille, min(v) AS exact
       |  FROM pc, nn, ps WHERE cumv * 1000 >= p_permille * n GROUP BY 1
       |)
       |SELECT CAST(e.p_permille AS INTEGER) AS p_permille, e.est, x.exact,
       |       round(abs(e.est - x.exact), 6) AS abs_err
       |FROM est e JOIN ex x USING (p_permille)""".stripMargin
  }

  /** DuckDB mirror of [[histMergeCheck]]; `shardSql` renders the shard
    * expression over the table's own columns. */
  def histMergeCheckOracleSql(table: String, valueSql: String,
                              shardSql: String, buckets: Int): String =
    s"""WITH b AS (
       |  SELECT CAST($valueSql AS DOUBLE) AS v, $shardSql AS shard
       |  FROM $table WHERE $valueSql IS NOT NULL
       |), mm AS (SELECT min(v) AS lo, max(v) AS hi FROM b),
       |bk AS (
       |  SELECT shard,
       |         CASE WHEN hi = lo THEN 0
       |              ELSE CAST(least(floor((v - lo) / ((hi - lo) / $buckets)), ${buckets - 1}) AS BIGINT)
       |         END AS bucket
       |  FROM b, mm
       |), full_ AS (SELECT bucket, count(*) AS cnt FROM bk GROUP BY 1),
       |shards AS (SELECT shard, bucket, count(*) AS cnt FROM bk GROUP BY 1, 2),
       |merged AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS cnt FROM shards GROUP BY 1)
       |SELECT CAST(count(*) AS BIGINT) AS n_cells,
       |       CAST(sum(CASE WHEN coalesce(f.cnt, -1) <> coalesce(m.cnt, -1)
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
       |FROM full_ f FULL OUTER JOIN merged m USING (bucket)""".stripMargin
}
