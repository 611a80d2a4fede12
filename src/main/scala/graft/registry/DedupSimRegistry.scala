package graft
package registry

import graft.core.Tables
import graft.dedup.Dedup
import graft.functions.VectorOps
import graft.ops.{CohortOps, Recodes}
import graft.sim.{Quantized, Similarity}
import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** deduplication and similarity/ANN search — one slice of the driver registry.
  *
  * Split out of Shared.scala in r12 (maintainability: the single file
  * had reached 8.7k lines). PURE CODE MOTION: entry bodies and oracle SQL
  * are byte-identical to the pre-split registry; SparkEntry composes the
  * slices back into the same `queries`/`oracleSql` maps. r13: misfiled
  * entries re-homed to their named family slice (pure motion again, same
  * duplicate-key guard).
  */
private[graft] object DedupSimRegistry {
  import Shared._

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // MMR diversity re-rank over SQ8 candidates: greedy λ=0.5 selection,
    // every compared score from exact integer dots, k−1 bounded join
    // rounds on the |queries|·nCand table — greedy made oracle-able
    "sim_mmr_rerank" -> ((s, d) =>
      Quantized.mmrRerank(t(s, d, "embeddings"), "vec_id", "embedding",
        nQueries = 6, nCand = 8, k = 4)),

    // set-similarity join with PPJoin prefix filtering: only each doc's
    // rarest (1−t)·len+1 tokens are indexed; the oracle runs the
    // UNRESTRICTED inverted-index join, so the hash match proves the
    // prefix + size pruning lost no qualifying pair
    "d_prefix_jaccard" -> ((s, d) =>
      graft.dedup.Dedup.prefixJaccardPairs(
        t(s, d, "documents"), "doc_id", "text", threshold = 0.95)),

    // fuzzy key matching: edit-distance pairs under lossless PassJoin
    // segment blocking (d+1 exact segments, ±d aligned probes) — the
    // oracle runs the UNBLOCKED quadratic, so the hash match proves zero
    // recall loss from the blocking
    "d_editdist_pairs" -> ((s, d) =>
      graft.dedup.Dedup.editDistancePairs(
        t(s, d, "part"), "p_name", maxDist = 3)),

    "d_exact_groups" -> ((s, d) =>
      Dedup.exactGroups(t(s, d, "documents"), "doc_id", "text")),

    // document-frequency cap ON: shingles in >100 docs are dropped before
    // the inverted-index self-join (uncapped hot shingles are O(df²) pair
    // bombs at scale — Dedup.scala skew note). Oracle applies the same cap.
    "d_jaccard_pairs" -> ((s, d) =>
      Dedup.jaccardPairs(t(s, d, "documents"), "doc_id", "text", n = 3, threshold = 0.05,
        maxShingleDf = Some(100L))),

    // benchmark decontamination: docs sharing any 3-gram with the probe
    // ("benchmark") subset — probe shingle set broadcasts, corpus is never
    // self-joined; production n is 8-13, scaled to n=3 for the short
    // synthetic texts so the check exercises real overlap (~150 docs hit)
    "d_contamination" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.contamination(
        docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0),
        "doc_id", "text", n = 3)
    }),

    "d_minhash_pairs" -> ((s, d) =>
      Dedup.minhashLshPairs(t(s, d, "documents"), "doc_id", "text")),

    // sketch quality as a hash-checked row: MinHash Jaccard estimate vs
    // the true shingle Jaccard, per LSH candidate pair (truth computed
    // only on the LSH-bounded candidates, never all pairs)
    "d_minhash_est" -> ((s, d) =>
      Dedup.minhashEstVsTruth(t(s, d, "documents"), "doc_id", "text")),

    "d_simhash_sigs" -> ((s, d) =>
      Dedup.simhashSignatures(t(s, d, "documents"), "doc_id", "text")),

    // pair graph → dedup CLUSTERS: connected components over the MinHash
    // LSH pairs (distributed min-label propagation), so transitive
    // duplicates (A,B)+(B,C) collapse to one surviving representative.
    // Exactly oracled: DuckDB regenerates the same pair graph and closes
    // it with a recursive CTE.
    "d_dup_clusters" -> ((s, d) => dupClustersCached(s, d)),

    // SimHash near-dup PAIRS (hamming ≤ 3): 4×15-bit pigeonhole chunk
    // blocking makes the candidate join an equi-join with ZERO recall
    // loss at this radius — completes the simhash path from signatures
    // to pairs; the oracle regenerates the signatures and repeats the
    // identical block join (xor + bit_count)
    "d_simhash_pairs" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), "doc_id", "text")),

    // sub-document boilerplate scrub (CCNet/RefinedWeb duplicate-line
    // removal at chunk granularity): a 3-token chunk seen in >2 distinct
    // docs is dropped from every doc; the md5 over each doc's kept chunks
    // hash-checks the REWRITTEN content, not just the drop counts
    "d_chunk_dedup" -> ((s, d) =>
      Dedup.chunkDedup(t(s, d, "documents"), "doc_id", "text",
        chunkTokens = 3, maxDocs = 2L)),

    // INCREMENTAL LSH maintenance: the 10%-delta "new crawl batch"
    // probes the persisted band index — base is read zero times, output
    // = only the NEW near-dup pairs (≥1 delta member). The full-
    // recompute-minus-old-pairs equivalence is property-spec'd.
    "inc_lsh_maintain" -> ((s, d) =>
      Dedup.incrementalLshPairsOnIndex(
        lshBaseIndexCached(s, d),
        t(s, d, "documents").filter(col("doc_id") % 10 === 0),
        "doc_id", "text")),

    // exact duplicated-SPAN detection (Lee et al. 2021 sequence-level
    // dedup): every 8-token window fingerprinted, windows repeated
    // corpus-wide merge into maximal per-doc spans (gaps-and-islands on
    // a doc_id-partitioned window — high-cardinality key, bounded by
    // one doc's length). The readout sizes a span-removal pass.
    "d_dup_spans" -> ((s, d) =>
      graft.dedup.SpanDedup.dupSpans(t(s, d, "documents"), "doc_id", "text", L = 8)),
    "sim_cosine_pairs" -> ((s, d) =>
      Similarity.cosinePairs(t(s, d, "embeddings"), "vec_id", "embedding", threshold = 0.35)),

    "sim_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
    }),

    // HYBRID retrieval via reciprocal-rank fusion (Cormack et al. 2009,
    // the BM25+dense production default): the lexical top-100 (BM25 over
    // documents, t_bm25's exact query) fused with the dense top-100
    // (cosine neighbors of vector 0) by pure rank arithmetic —
    // 1/(60+rank) contributions summed as exact decimals. Both legs AND
    // the fusion are exactly oracled; list depths bound every stage
    "sim_rrf_fusion" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val sem = Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 100)
        .select(col("neighbor_id").as("id"), col("rank").as("r"))
      val lexTop = graft.text.Bm25.scores(
        t(s, d, "documents"), "doc_id", "text",
        Seq("join", "window", "stream", "vector"))
        .orderBy(desc("score"), asc("doc_id")).limit(100)
      val lex = lexTop
        .withColumn("r", row_number().over(
          Window.orderBy(desc("score"), asc("doc_id"))))
        .select(col("doc_id").as("id"), col("r"))
      Similarity.rrfFuse(Seq(lex, sem), "id", "r", kConst = 60, topK = 20)
    }),
      // rank over ≤100 rows — bounded by the declared list depth, never
      // data-sized (the TakeOrdered cut above is the distributed part)

    // hard-negative mining: per query, top-k most-similar DIFFERENT-label
    // vectors — broadcast queries, corpus never shuffled, label predicate
    // fused into the join
    "sim_hard_negatives" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", "label", k = 5)
    }),

    // IVF top-k on a LEARNED coarse quantizer — r12 verdict #2: the
    // quantizer is now the repo's own deterministic Lloyd (2 unrolled
    // rounds, data-point init, exact-long micro sums) instead of MLlib
    // k-means (RNG ⇒ was the one convertible no_oracle row), so the
    // ENTIRE query — training, corpus/query assignment, probe set,
    // in-list ranking — is exactly DuckDB-oracled. Embeddings are cast
    // to double first (the ivfRecall discipline) so every dot product
    // accumulates bit-identically to the oracle's list_sum fold.
    "sim_ivf_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val embD = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val centroids = graft.sim.Lloyd.fitCentroids(
        embD, "vec_id", "embedding", k = 16, iters = 2)
      Similarity.ivfTopK(embD, embD.filter(col("vec_id") < 10), centroids,
        "vec_id", "embedding", k = 5, nprobe = 2)
    }),

    // ANN quality as a HASH-CHECKED row: recall@5 of the IVF path vs brute
    // force, per query. Pivots are deterministic data points (IVF-Flat),
    // so the oracle replays assignment/probing/ranking exactly — the
    // kmeans variant above keeps exercising the model path (rows-only).
    "sim_ivf_recall" -> ((s, d) =>
      Similarity.ivfRecall(t(s, d, "embeddings"), "vec_id", "embedding",
        k = 5, nprobe = 4, nPivots = 16, nQueries = 10)),

    // embedding-cosine near-dup: the PRODUCTION path is RHP-LSH banding
    // (sub-quadratic candidate generation + exact-cosine verify), not the
    // O(n²) crossJoin — `sim_cosine_pairs` remains the exact oracle tier.
    // The DuckDB oracle mirrors the same deterministic algorithm (same
    // seeded sign matrix, integer-quantized projections), so correctness
    // is verified exactly without depending on LSH recall.
    // bitsPerBand PINNED to the oracle's width (also the r12 default —
    // reproducible, action-free): the corpus-sized derivation would
    // silently diverge from the static 6-bit oracle CTEs the moment the
    // embeddings table crosses 2048 rows — an oracled row pins ALL its
    // params; scale-path callers use rhpNearDupPairsAuto instead
    "d_embed_neardup" -> ((s, d) =>
      Similarity.rhpNearDupPairs(t(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, threshold = 0.45, bitsPerBand = 6)),

    // SemDeDup composition (semantic dedup over embeddings): RHP-LSH
    // near-dup pairs → min-label connected components → keep ONE member
    // per cluster by a deterministic hash-derived quality score (a stand-
    // in for a real quality signal — perplexity, toxicity — that is
    // exactly mirrorable in the oracle). Every stage reuses its
    // individually-oracled machinery; this query hash-checks the composed
    // pipeline — the embedding-space analog of d_cluster_keep
    "sim_semantic_keep" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val pairs = Similarity.rhpNearDupPairs(emb, "vec_id", "embedding",
          dim = 64, threshold = 0.45, bitsPerBand = 6) // pinned to the oracle (see d_embed_neardup)
        .select(col("keep_id").as("doc_a"), col("dup_id").as("doc_b"))
      val clusters = Dedup.dupClusters(pairs, emb, "vec_id")
      val scored = emb.withColumn("_q", permilleHash1M(col("vec_id"), ":semq"))
      Dedup.clusterKeep(clusters, scored, "vec_id", "_q")
    }),

    // int8 scalar quantization: 4× smaller corpus, exact integer dots in
    // the hot loop — ranking is hash-checked (the integer arithmetic makes
    // the whole query bit-deterministic, unlike float-accumulation paths)
    "sim_sq8_topk" -> ((s, d) =>
      Quantized.sq8TopK(t(s, d, "embeddings"), "vec_id", "embedding",
        nQueries = 10, k = 5)),

    // binary quantization + oversampled rescoring: 32× smaller corpus
    // (sign bits in packed words), popcount(XOR) shortlist in exact
    // integers, float cosine only on the shortlist — the most aggressive
    // point on the ANN compression curve, fully oracle-able
    "sim_bq_topk" -> ((s, d) =>
      Quantized.bqTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, nQueries = 10, shortlist = 16, k = 5)),

    // product quantization + ADC: dim×4 bytes → m bytes per vector, m LUT
    // lookups per candidate instead of a dim-length dot. Data-point
    // codebook keeps encode/score exactly oracle-able.
    "sim_pq_topk" -> ((s, d) =>
      Quantized.pqTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, m = 8, nCodes = 16, nQueries = 10, k = 5)),

    // IVF-PQ + exact re-rank: the production billion-vector composition
    // (coarse quantizer → inverted-list ADC scan → exact top-`rerank`
    // refine). Deterministic data-point codebooks keep the ENTIRE
    // composition exactly oracled — coarse argmax, probe set, ADC fold,
    // shortlist, and the refined final ranking
    "sim_ivfpq_topk" -> ((s, d) =>
      Quantized.ivfPqTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, m = 8, nCodes = 16, nPivots = 16, nprobe = 2,
        nQueries = 10, rerank = 20, k = 5)),

    // recall accounting for the row above: per-query overlap between the
    // PRODUCTION-config IVF-PQ top-k (nprobe=2 of 16 lists — the probe
    // really skips 7/8 of the corpus) and the exact brute-force top-k,
    // as exact integers. The ANN-recall analog of the a2/a10 sketch
    // audits: the quality loss of the approximation is itself a
    // hash-checked row, not a claim
    "sim_ivfpq_recall" -> ((s, d) =>
      Quantized.ivfPqRecall(t(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, m = 8, nCodes = 16, nPivots = 16, nprobe = 2,
        nQueries = 10, rerank = 20, k = 5)),

    // exactly-oracled distributed Lloyd k-means: 3 unrolled rounds of
    // (broadcast-centroid argmin → per-cluster exact integer sums) over
    // micro-quantized vectors; per-member distances round to integer
    // micro² before the inertia sum so the readout is order-independent.
    // The iterative-ML twin of the PageRank/BFS iterated-join oracles —
    // MLlib's KMeans data path with every intermediate cross-engine-proof
    "sim_kmeans_lloyd" -> ((s, d) =>
      graft.sim.Lloyd.fitStats(t(s, d, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 3)),

    // PQ ranking quality vs exact brute force as a hash-checked row
    "sim_pq_recall" -> ((s, d) =>
      Quantized.pqRecall(t(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, m = 8, nCodes = 16, nQueries = 10, k = 5)),

    // k-means-TRAINED PQ codebooks (the real FAISS training path): 2
    // unrolled Lloyd rounds per subspace (the subspace axis rides INSIDE
    // each round's frames — 8 subspaces cost the same job count as 1),
    // then the corpus encode under the trained centroids; readout = per
    // (subspace, cluster) member count + exact-integer inertia
    "sim_pqtrain_stats" -> ((s, d) =>
      graft.sim.PqTrain.trainStats(t(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, m = 8, kCodes = 16, iters = 2)),

    // the full train→index→query loop: ADC top-k against the TRAINED
    // codebooks — LUT of query-subvector · trained-centroid dots,
    // subspace-ordered fold, (adc DESC, id ASC) ranking; every stage
    // cross-engine-checked
    "sim_pqtrain_topk" -> ((s, d) =>
      graft.sim.PqTrain.trainedTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, m = 8, kCodes = 16, iters = 2, nQueries = 10, k = 5)),

    // Matryoshka-style prefix search: corpus-wide pass reads only the
    // first 16 of 64 dims, exact rerank touches k×overfetch rows per query
    "sim_prefix_rerank" -> ((s, d) =>
      Similarity.prefixRerankTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        prefixDim = 16, nQueries = 10, k = 5, overfetch = 4)),

    // retention policy on the dup-cluster graph: keep the best-quality
    // member per cluster (longest text, tiebreak lowest id) — the final
    // step of a dedup pass, one aggregate over the labeled corpus
    // retention policy reads the memoized cluster labeling — the chain up
    // to connected components is computed once per session (see
    // dupClustersCached), not re-run per policy
    "d_cluster_keep" -> ((s, d) =>
      Dedup.clusterKeep(dupClustersCached(s, d), t(s, d, "documents"),
        "doc_id", "n_chars")),
  )

  val oracles: Seq[(String, String)] = Seq(
    "sim_mmr_rerank" -> Quantized.mmrRerankOracleSql(
      "embeddings", "vec_id", "embedding",
      dim = 64, nQueries = 6, nCand = 8, k = 4),

    "d_prefix_jaccard" -> graft.dedup.Dedup.prefixJaccardOracleSql(
      "documents", "doc_id", "text", threshold = 0.95),

    "d_editdist_pairs" -> graft.dedup.Dedup.editDistancePairsOracleSql(
      "part", "p_name", maxDist = 3),

    "d_exact_groups" ->
      """SELECT CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')) = 0
        |       THEN md5(lower(text))
        |       ELSE md5(array_to_string(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> ''), ' '))
        |  END AS sig,
        |       count(*) AS dup_cnt, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1""".stripMargin,

    "d_jaccard_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS t
        |  FROM documents
        |), sh0 AS (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
        |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        |    FROM toks WHERE len(t) >= 3
        |  )
        |), keep AS (
        |  SELECT shingle FROM sh0 GROUP BY 1 HAVING count(*) <= 100
        |), sh AS (
        |  SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)
        |), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter_cnt,
        |       CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
        |FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.05""".stripMargin,

    "d_embed_neardup" ->
      Similarity.rhpNearDupOracleSql("embeddings", "vec_id", "embedding",
        dim = 64, threshold = 0.45),

    "sim_semantic_keep" ->
      Similarity.semanticKeepOracleSql("embeddings", "vec_id", "embedding",
        dim = 64, threshold = 0.45,
        qualitySql = permilleHashSql("d.vec_id", ":semq", 1000000L)),

    "sim_kmeans_lloyd" -> graft.sim.Lloyd.fitStatsOracleSql(
      "embeddings", "vec_id", "embedding", k = 8, iters = 3, dim = 64),

    "sim_ivf_topk" -> graft.sim.Lloyd.ivfTopKOracleSql(
      "embeddings", "vec_id", "embedding",
      kClusters = 16, iters = 2, dim = 64, nprobe = 2, nQueries = 10, topK = 5),

    "d_dup_clusters" ->
      Dedup.dupClustersOracleSql("documents", "doc_id", "text"),

    "d_chunk_dedup" ->
      Dedup.chunkDedupOracleSql("documents", "doc_id", "text",
        chunkTokens = 3, maxDocs = 2L),

    "d_dup_spans" ->
      graft.dedup.SpanDedup.dupSpansOracleSql("documents", "doc_id", "text", L = 8),

    "inc_lsh_maintain" ->
      Dedup.incrementalLshOracleSql("documents", "doc_id", "text",
        deltaPredSql = "%ID% % 10 = 0"),

    "sim_cosine_pairs" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i])) /
        |  (sqrt(list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * a.e[i]))) *
        |   sqrt(list_sum(list_transform(range(1, len(b.e) + 1), i -> b.e[i] * b.e[i])))) AS cosine
        |FROM v a, v b
        |WHERE a.vec_id < b.vec_id
        |  AND list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i])) /
        |      (sqrt(list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * a.e[i]))) *
        |       sqrt(list_sum(list_transform(range(1, len(b.e) + 1), i -> b.e[i] * b.e[i])))) >= 0.35""".stripMargin,

    "sim_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    list_sum(list_transform(range(1, len(c.e) + 1), i -> q.qe[i] * c.e[i])) /
        |    (sqrt(list_sum(list_transform(range(1, len(q.qe) + 1), i -> q.qe[i] * q.qe[i]))) *
        |     sqrt(list_sum(list_transform(range(1, len(c.e) + 1), i -> c.e[i] * c.e[i])))) AS cosine
        |  FROM v c, q WHERE q.query_id <> c.vec_id
        |)
        |SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored
        |) WHERE rank <= 5""".stripMargin,

    "sim_rrf_fusion" ->
      s"""WITH ${graft.text.Bm25.scoresCtes("documents", "doc_id", "text",
             Seq("join", "window", "stream", "vector"))},
         |lexr AS (
         |  SELECT id, r FROM (
         |    SELECT doc_id AS id,
         |           row_number() OVER (ORDER BY score DESC, doc_id) AS r
         |    FROM bm25_scores
         |  ) WHERE r <= 100
         |), v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
         |semr AS (
         |  SELECT id, r FROM (
         |    SELECT c.vec_id AS id, row_number() OVER (ORDER BY
         |      list_sum(list_transform(range(1, len(c.e) + 1), i -> q.qe[i] * c.e[i])) /
         |      (sqrt(list_sum(list_transform(range(1, len(q.qe) + 1), i -> q.qe[i] * q.qe[i]))) *
         |       sqrt(list_sum(list_transform(range(1, len(c.e) + 1), i -> c.e[i] * c.e[i])))) DESC,
         |      c.vec_id) AS r
         |    FROM v c, q WHERE c.vec_id <> 0
         |  ) WHERE r <= 100
         |), fused AS (
         |  SELECT id,
         |    round(CAST(SUM(CAST(round(1.0 / (60 + CAST(r AS DOUBLE)), 9)
         |      AS DECIMAL(18,9))) AS DOUBLE), 6) AS rrf,
         |    CAST(count(*) AS BIGINT) AS n_lists
         |  FROM (SELECT id, r FROM lexr UNION ALL SELECT id, r FROM semr)
         |  GROUP BY 1
         |)
         |SELECT id, rrf, n_lists FROM (
         |  SELECT *, row_number() OVER (ORDER BY rrf DESC, id) AS rn FROM fused
         |) WHERE rn <= 20""".stripMargin,

    "sim_hard_negatives" ->
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT vec_id AS query_id, label AS ql, e AS qe FROM v WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    list_sum(list_transform(range(1, len(c.e) + 1), i -> q.qe[i] * c.e[i])) /
        |    (sqrt(list_sum(list_transform(range(1, len(q.qe) + 1), i -> q.qe[i] * q.qe[i]))) *
        |     sqrt(list_sum(list_transform(range(1, len(c.e) + 1), i -> c.e[i] * c.e[i])))) AS cosine
        |  FROM v c, q WHERE q.query_id <> c.vec_id AND q.ql <> c.label
        |)
        |SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored
        |) WHERE rank <= 5""".stripMargin,

    "d_contamination" -> Dedup.contaminationOracleSql(
      "documents", "doc_id", "text", n = 3,
      probePredSql = "doc_id % 100 = 0", candPredSql = "doc_id % 100 <> 0"),

    "d_minhash_pairs" ->
      Dedup.minhashLshOracleSql("documents", "doc_id", "text"),

    "d_minhash_est" ->
      Dedup.minhashEstOracleSql("documents", "doc_id", "text"),

    "d_simhash_sigs" ->
      Dedup.simhashOracleSql("documents", "doc_id", "text"),

    "sim_ivf_recall" ->
      Similarity.ivfRecallOracleSql("embeddings", "vec_id", "embedding",
        dim = 64, k = 5, nprobe = 4, nPivots = 16, nQueries = 10),

    "sim_sq8_topk" ->
      Quantized.sq8TopKOracleSql("embeddings", "vec_id", "embedding",
        dim = 64, nQueries = 10, k = 5),

    "sim_bq_topk" ->
      Quantized.bqTopKOracleSql("embeddings", "vec_id", "embedding",
        dim = 64, nQueries = 10, shortlist = 16, k = 5),

    "sim_pq_topk" ->
      Quantized.pqTopKOracleSql("embeddings", "vec_id", "embedding",
        dim = 64, m = 8, nCodes = 16, nQueries = 10, k = 5),

    "sim_pq_recall" ->
      Quantized.pqRecallOracleSql("embeddings", "vec_id", "embedding",
        dim = 64, m = 8, nCodes = 16, nQueries = 10, k = 5),

    "sim_ivfpq_topk" ->
      Quantized.ivfPqTopKOracleSql("embeddings", "vec_id", "embedding",
        dim = 64, m = 8, nCodes = 16, nPivots = 16, nprobe = 2,
        nQueries = 10, rerank = 20, k = 5),

    "sim_ivfpq_recall" ->
      Quantized.ivfPqRecallOracleSql("embeddings", "vec_id", "embedding",
        dim = 64, m = 8, nCodes = 16, nPivots = 16, nprobe = 2,
        nQueries = 10, rerank = 20, k = 5),

    "sim_pqtrain_stats" ->
      graft.sim.PqTrain.trainStatsOracleSql("embeddings", "vec_id", "embedding",
        dim = 64, m = 8, kCodes = 16, iters = 2),

    "sim_pqtrain_topk" ->
      graft.sim.PqTrain.trainedTopKOracleSql("embeddings", "vec_id", "embedding",
        dim = 64, m = 8, kCodes = 16, iters = 2, nQueries = 10, k = 5),

    "sim_prefix_rerank" ->
      Similarity.prefixRerankOracleSql("embeddings", "vec_id", "embedding",
        dim = 64, prefixDim = 16, nQueries = 10, k = 5, overfetch = 4),

    "d_cluster_keep" ->
      Dedup.clusterKeepOracleSql("documents", "doc_id", "text", "n_chars"),

    "d_simhash_pairs" -> graft.dedup.Dedup.simhashPairsOracleSql(
      "documents", "doc_id", "text"),
  )
}
