package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The scale-growth CONTRACT, pinned as tests (companion to the SCALE.md
  * artifact `graft.Scale` writes): on the ScaleSynth corpus — constant
  * planted-dup rate, Heaps-law vocabulary — the banded dedup family's
  * candidate and output pair counts must grow NEAR-LINEARLY in corpus
  * size (ratio < 10^1.3 ≈ 20 for a 10× corpus), where the all-pairs
  * baseline grows 100×. Counts are pure functions of the hash-generated
  * data, so a failure here means an OPERATOR regression (a banding
  * densified, a blocking collapsed), not noise.
  */
class ScaleSpec extends SparkSpecBase {

  private val n1 = 1000L
  private val n2 = 10000L
  private val supraLinear = math.pow(10.0, 1.3) // the SCALE.md bound

  test("MinHash-LSH: band-bucket candidates and found pairs grow near-linearly " +
    "over a 10x corpus (all-pairs would grow 100x)") {
    def stats(n: Long): (Long, Long) = {
      val docs = ScaleSynth.documents(spark, n).cache()
      try {
        val cand = graft.dedup.Dedup
          .minhashBandsPerRow(docs, "doc_id", "text")
          .groupBy("band", "bucket").agg(count(lit(1)).as("c"))
          .agg(sum((col("c") * (col("c") - 1) / 2).cast("long")))
          .collect()(0).getLong(0)
        val pairs = graft.dedup.Dedup.minhashLshPairs(docs, "doc_id", "text").count()
        (cand, pairs)
      } finally docs.unpersist()
    }
    val (c1, p1) = stats(n1)
    val (c2, p2) = stats(n2)
    assert(p1 > 0, "no near-dup pairs found at 1x — planted dups missed")
    val candRatio = c2.toDouble / c1
    val pairRatio = p2.toDouble / p1
    assert(candRatio < supraLinear,
      s"banding densified: candidates grew ${candRatio}x over a 10x corpus ($c1 -> $c2)")
    assert(pairRatio > 5 && pairRatio < supraLinear,
      s"found pairs grew ${pairRatio}x over a 10x corpus ($p1 -> $p2); " +
        "expected ~10x (constant planted-dup rate)")
  }

  test("prefix-filter Jaccard: verified pairs AND the filtered candidate " +
    "stream grow near-linearly over a 10x corpus, with the r11 filter " +
    "chain (asymmetric index prefix + size + positional) holding the " +
    "candidate:pair ratio under 1000:1 (pre-r11 it was ~2,400:1)") {
    def stats(n: Long): (Long, Long) = {
      val docs = ScaleSynth.documents(spark, n).cache()
      try {
        val cand = graft.dedup.Dedup
          .prefixJaccardCandidateCount(docs, "doc_id", "text", threshold = 0.9)
        val (p, release) = graft.dedup.Dedup
          .prefixJaccardPairsReleasable(docs, "doc_id", "text", threshold = 0.9)
        try (cand, p.count()) finally release()
      } finally docs.unpersist()
    }
    // measured ABOVE the generator's vocabulary floor (V = max(2000,
    // n/2)): below 4k docs the vocab is pinned at 2000 types, so token
    // posting lists densify ∝ n²/V by DATA, not by algorithm — the
    // scaladoc'd Heaps-law caveat. 5k/50k are SCALE.md's own tiers.
    val (c1, p1) = stats(5000L); val (c2, p2) = stats(50000L)
    assert(p1 > 0, "no qualifying pairs at 1x")
    val r = p2.toDouble / p1
    assert(r > 5 && r < supraLinear,
      s"pairs grew ${r}x over a 10x corpus ($p1 -> $p2); expected ~10x")
    val cr = c2.toDouble / c1
    assert(cr < supraLinear,
      s"candidate stream densified: ${cr}x over a 10x corpus ($c1 -> $c2)")
    assert(c1 < 1000 * p1 && c2 < 1000 * p2,
      s"filter chain regressed: candidates per verified pair " +
        s"${c1 / math.max(p1, 1)}:1 at 1x, ${c2 / math.max(p2, 1)}:1 at 10x " +
        "(measured ~430:1 with the r11 chain; the prefix-only join was ~2,400:1)")
  }

  test("SimHash pigeonhole: found pairs grow near-linearly over a 10x corpus " +
    "(the blocking that densified on marker-heavy text — SCALE.md finding #2)") {
    def pairs(n: Long): Long = {
      val docs = ScaleSynth.documents(spark, n).cache()
      try graft.dedup.Dedup.simhashPairs(docs, "doc_id", "text").count()
      finally docs.unpersist()
    }
    val p1 = pairs(n1); val p2 = pairs(n2)
    assert(p1 > 0, "no SimHash near-dup pairs at 1x — planted dups missed")
    val r = p2.toDouble / p1
    assert(r > 4 && r < supraLinear,
      s"SimHash pairs grew ${r}x over a 10x corpus ($p1 -> $p2); a supra-" +
        "linear blowup means the chunk buckets densified")
  }

  test("RHP-LSH with corpus-sized buckets finds exactly the planted copies " +
    "at both scales (the nlist sizing rule — SCALE.md finding #1)") {
    def pairs(n: Long): Long = {
      // no caller-supplied bitsPerBand: the operator's own
      // autoBitsPerBand default must size the bucket space (6 bits at
      // 2k vectors, 10 at 20k) — the r10 sizing rule moved into code
      val emb = ScaleSynth.embeddings(spark, n).cache()
      try graft.sim.Similarity.rhpNearDupPairs(emb, "vec_id", "embedding",
        dim = 64, threshold = 0.9).count()
      finally emb.unpersist()
    }
    // planted copies have cosine ≈ 0.999 (±0.01 jitter on a unit-scale
    // base); random 64-dim pairs sit near 0 — the 0.9 cut is exact
    assert(pairs(n1) == n1 / 10, "planted embedding copies missed at 1x")
    assert(pairs(n2) == n2 / 10, "planted embedding copies missed at 10x")
  }

  test("PassJoin edit distance: finds exactly the planted distance-1 copies " +
    "at both scales (lossless blocking, linear output)") {
    def pairs(n: Long): Long = {
      val keys = ScaleSynth.keys(spark, n).cache()
      try graft.dedup.Dedup.editDistancePairs(keys, "key", maxDist = 2).count()
      finally keys.unpersist()
    }
    // every 10th key is a 1-substitution copy of its predecessor and the
    // 24-hex-char key space makes accidental d<=2 pairs impossible at
    // these sizes — the planted count IS the expected output
    assert(pairs(n1) == n1 / 10, "planted copies missed or spurious pairs at 1x")
    assert(pairs(n2) == n2 / 10, "planted copies missed or spurious pairs at 10x")
  }
}
