package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zero-file corpus generator for SCALE-GROWTH measurement (the
  * MimicSynth pattern: every cell is pure hash arithmetic over a
  * `spark.range`, so a 100× corpus costs no storage and is
  * bit-reproducible at any size on any cluster).
  *
  * Unlike MimicSynth this family is NOT DuckDB-mirrored — it feeds the
  * scale-exponent harness ([[graft.Scale]]), not correctness oracles — so
  * the draws ride codegen'd `xxhash64` instead of md5 (30 M word draws at
  * the 100× scale would spend minutes in interpreted md5-string
  * expressions for no benefit).
  *
  * Structure, chosen to make scale exponents MEANINGFUL:
  *  - 10% of docs are near-duplicates: doc i with i%10==1 copies doc i−1
  *    with ~2% of words mutated — a constant planted-dup rate, so true
  *    near-dup pairs grow LINEARLY in n by construction.
  *  - the vocabulary grows with the corpus (V(n) = max(2000, n/2)) —
  *    Heaps' law, the property of real corpora that keeps posting lists
  *    from densifying; with a FIXED vocabulary any inverted-index join is
  *    inherently Θ(n²/V), which is a property of the data, not the
  *    algorithm. SCALE.md documents this assumption.
  */
object ScaleSynth {

  private def draw(key: Column, salt: String, m: Long): Column =
    pmod(xxhash64(key, lit(salt)), lit(m))

  /** doc i copies doc i−1 when i%10==1 (and i>0): the base id whose
    * draws the copy re-reads.
    */
  private def baseId(i: Column): Column =
    when(i % 10 === 1 && i > 0, i - 1).otherwise(i)

  /** (doc_id, text): ~40–79 space-joined words; copies mutate ~2% of
    * word slots ("m…" tokens never collide with the "w…" pool).
    */
  def documents(s: SparkSession, n: Long): DataFrame = {
    val vocab = math.max(2000L, n / 2)
    val i = col("id")
    val b = baseId(i)
    val len = lit(40L) + draw(b, "len", 40L)
    // ~5% of slots carry an English marker word so the docs pass the
    // curation funnel's language gate (≈3 markers/doc). The rate is
    // deliberately LOW: shared high-frequency tokens bias SimHash's
    // majority-vote bits identically across unrelated docs, collapsing
    // the pigeonhole chunks into hot buckets — at 20% markers the 500k
    // SimHash candidate join went quadratic (a data-realism artifact:
    // real stopword mass spreads over hundreds of types, not 5)
    val markers = array(Seq("the", "and", "of", "to", "in").map(lit): _*)
    // pool ids render as LETTERS (digit→letter translate): the text
    // operators tokenize on alpha runs (TextOps.tokens mirrors the
    // reference's isalpha filter), so "w123"-style words would all
    // collapse to "w" and every doc would look like a near-dup
    def alphaWord(prefix: String, id: Column): Column =
      concat(lit(prefix),
        translate(id.cast("string"), "0123456789", "abcdefghij"))
    val words = transform(sequence(lit(1L), len), j => {
      val key = concat_ws("_", b, j)
      val baseWord = when(draw(key, "mk", 20L) === 0L,
        element_at(markers, (draw(key, "mkw", 5L) + 1L).cast("int")))
        .otherwise(alphaWord("w", draw(key, "w", vocab)))
      val mutated = alphaWord("m", draw(concat_ws("_", i, j), "mw", vocab))
      when(i =!= b && draw(concat_ws("_", i, j), "mut", 100L) < 2, mutated)
        .otherwise(baseWord)
    })
    s.range(n).select(i.as("doc_id"), concat_ws(" ", words).as("text"))
  }

  /** (vec_id, embedding float[dim]): components in [−1, 1]; copies get a
    * ±0.01 per-component perturbation of their base vector.
    */
  def embeddings(s: SparkSession, n: Long, dim: Int = 64): DataFrame = {
    val i = col("id")
    val b = baseId(i)
    val comps = transform(sequence(lit(0L), lit(dim - 1L)), d => {
      val base = (draw(concat_ws("_", b, d), "e", 2001L) - 1000L)
        .cast("double") / 1000.0
      val jitter = (draw(concat_ws("_", i, d), "ej", 21L) - 10L)
        .cast("double") / 1000.0
      (when(i =!= b, base + jitter).otherwise(base)).cast("float")
    })
    s.range(n).select(i.as("vec_id"), comps.as("embedding"))
  }

  /** (key_id, key): 24-char hex-ish strings; copies substitute exactly
    * one position with 'z' (never in the hex alphabet → edit distance 1).
    */
  def keys(s: SparkSession, n: Long): DataFrame = {
    val i = col("id")
    val b = baseId(i)
    val base24 = concat(
      lpad(hex(draw(b, "k1", Long.MaxValue)), 8, "0"),
      lpad(hex(draw(b, "k2", Long.MaxValue)), 8, "0"),
      lpad(hex(draw(b, "k3", Long.MaxValue)), 8, "0"))
    val p = (draw(i, "kp", 24L) + 1L).cast("int")
    val key = when(i =!= b,
      concat(base24.substr(lit(1), p - 1), lit("z"),
        base24.substr(p + 1, lit(24) - p)))
      .otherwise(base24)
    s.range(n).select(i.as("key_id"), key.as("key"))
  }

  /** Zipf(s)-truncated rank draw in [1, k] from a uniform hash draw —
    * continuous inverse-CDF of the truncated power law: rank =
    * (1 + u·(k^(1−s) − 1))^(1/(1−s)). At s=1.1 the hottest rank holds
    * ~10% of all draws regardless of k — the power-law key profile real
    * join/agg keys have (the reference's own SUBJECT_ID is power-law-ish)
    * and the thing volume-only scaling cannot see: at 1000 reducers a 10%
    * hot key is a 100× straggler unless the operator salts.
    */
  private def zipfRank(u: Column, k: Long, s: Double): Column = {
    val a = 1.0 - s
    val kPow = math.pow(k.toDouble, a)
    least(greatest(
      floor(pow(lit(1.0) + u * (kPow - 1.0), 1.0 / a)).cast("long"),
      lit(1L)), lit(k))
  }

  private def unitDraw(key: Column, salt: String): Column =
    (draw(key, salt, 1000000000L).cast("double") + 0.5) / 1.0e9

  /** Key space for [[zipfKeyed]]: grows with the rows (n/10) so the fit
    * isolates volume; the hot-key SHARE stays ~constant by Zipf shape.
    */
  def zipfKeySpace(nRows: Long): Long = math.max(nRows / 10L, 64L)

  /** (row_id, key, v): the skew-tier fact table — keys Zipf(s≈1.1) over
    * [[zipfKeySpace]] ranks (hottest key ≈ 10% of rows at any size),
    * uniform numeric measure. Feeds the salted-agg/salted-join skew
    * bands in [[graft.Scale]] and the deterministic reducer-load pins in
    * ScaleSpec.
    */
  def zipfKeyed(sp: SparkSession, nRows: Long, s: Double = 1.1): DataFrame = {
    val k = zipfKeySpace(nRows)
    sp.range(nRows).select(
      col("id").as("row_id"),
      zipfRank(unitDraw(col("id"), "zu"), k, s).as("key"),
      draw(col("id"), "zv", 1000L).cast("double").as("v"))
  }

  /** (dkey, grp): the dimension side matching [[zipfKeyed]]'s key space —
    * one row per key, 32 rollup groups.
    */
  def zipfDim(sp: SparkSession, nRows: Long): DataFrame =
    sp.range(1L, zipfKeySpace(nRows) + 1L).select(
      col("id").as("dkey"), pmod(col("id"), lit(32L)).as("grp"))

  /** [[documents]] with Zipf(s≈1.1)-distributed word ranks instead of
    * uniform draws: token document-frequencies follow the power law real
    * text has, so a handful of non-marker tokens appear in a large share
    * of docs — the HOT-POSTING profile that makes un-salted inverted-
    * index joins straggle. Same planted-dup structure (i%10==1 copies
    * i−1, ~2% mutated slots), same Heaps vocabulary, same marker rate,
    * so exponents are comparable with the uniform corpus and the only
    * changed variable is key skew.
    */
  def zipfDocuments(sp: SparkSession, n: Long, s: Double = 1.1): DataFrame = {
    val vocab = math.max(2000L, n / 2)
    val i = col("id")
    val b = baseId(i)
    val len = lit(40L) + draw(b, "len", 40L)
    val markers = array(Seq("the", "and", "of", "to", "in").map(lit): _*)
    def alphaWord(prefix: String, id: Column): Column =
      concat(lit(prefix),
        translate(id.cast("string"), "0123456789", "abcdefghij"))
    val words = transform(sequence(lit(1L), len), j => {
      val key = concat_ws("_", b, j)
      val baseWord = when(draw(key, "mk", 20L) === 0L,
        element_at(markers, (draw(key, "mkw", 5L) + 1L).cast("int")))
        .otherwise(alphaWord("w", zipfRank(unitDraw(key, "zw"), vocab, s)))
      val mutated = alphaWord("m",
        zipfRank(unitDraw(concat_ws("_", i, j), "zmw"), vocab, s))
      when(i =!= b && draw(concat_ws("_", i, j), "mut", 100L) < 2, mutated)
        .otherwise(baseWord)
    })
    sp.range(n).select(i.as("doc_id"), concat_ws(" ", words).as("text"))
  }

  /** (doc_id, text): 256-char uniform printable-ASCII payload strings for
    * the multimodal pHash band — byte-level entropy like real media.
    * The WORD corpus is the wrong payload here: its docs share one
    * narrow character distribution, so their byte-histogram pHash bits
    * collapse into a few values and every bucket goes hot (r12 finding —
    * the text-payload analog of the SimHash marker-mass caveat). Copies
    * (i%10==1) mutate ~2% of character slots, keeping the planted-dup
    * rate and hamming-proximity structure of the other corpora.
    */
  def payloadStrings(s: SparkSession, n: Long, nChars: Int = 256): DataFrame = {
    val i = col("id")
    val b = baseId(i)
    val chars = transform(sequence(lit(1L), lit(nChars.toLong)), j => {
      val base = chr(lit(32L) + draw(concat_ws("_", b, j), "pc", 95L))
      val mut = chr(lit(32L) + draw(concat_ws("_", i, j), "pmc", 95L))
      when(i =!= b && draw(concat_ws("_", i, j), "mut", 100L) < 2, mut)
        .otherwise(base)
    })
    s.range(n).select(i.as("doc_id"), concat_ws("", chars).as("text"))
  }

  /** (src, dst) edge list for the iterated-join graph family: EXACTLY
    * nEdges hash-drawn edges over nEdges/8 nodes (constant mean degree
    * ~16 counting both endpoints, so density — the thing that makes an
    * iterated join blow up — stays FIXED as the graph grows; only size
    * scales). Self-loops are impossible BY CONSTRUCTION (dst is drawn
    * as a nonzero offset from src, mod the universe), so the realized
    * count equals the parameter and `edgeNodeCount(edges.count())`
    * recovers the exact node universe the endpoints were drawn over.
    * No dedup: multi-edges are what a real co-occurrence extraction
    * feeds these operators before their own `.distinct()`.
    */
  def edges(s: SparkSession, nEdges: Long): DataFrame = {
    val nNodes = edgeNodeCount(nEdges)
    val src = draw(col("id"), "es", nNodes)
    s.range(nEdges).select(
      src.as("src"),
      pmod(src + 1L + draw(col("id"), "ed", nNodes - 1), lit(nNodes)).as("dst"))
  }

  /** Node universe size for [[edges]] (constant mean degree). */
  def edgeNodeCount(nEdges: Long): Long = math.max(nEdges / 8L, 16L)

  /** (node_id) universe matching [[edges]]. */
  def edgeNodes(s: SparkSession, nEdges: Long): DataFrame =
    s.range(edgeNodeCount(nEdges)).select(col("id").as("node_id"))
}
