package graft.dedup

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "The quick brown fox jumps over the lazy dog!"), // exact dup of 1 after normalize
    (3L, "the quick brown fox jumps over the sleepy dog and then rests"), // near-dup
    (4L, "completely different content about spark query engines and shuffles"),
    (5L, "zz") // too short for 3-shingles
  ).toDF("doc_id", "text")

  test("exactGroups collapses normalized duplicates to min id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    val dup = g.filter(_.getAs[Long]("dup_cnt") == 2)
    assert(dup.length == 1 && dup(0).getAs[Long]("keep_id") == 1L)
    assert(g.length == 4) // 5 docs, one merged pair
  }

  test("dropExactDuplicates keeps one row per content") {
    val kept = Dedup.dropExactDuplicates(docs, "doc_id", "text").collect()
    assert(kept.length == 4)
    assert(!kept.map(_.getAs[Long]("doc_id")).contains(2L))
  }

  test("jaccardPairs finds the constructed near-dup and not the unrelated doc") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L))) // identical → jaccard 1.0
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near-dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("containmentPairs flags a short doc embedded in a long one that jaccard misses") {
    val d2 = Seq(
      (1L, "alpha beta gamma delta"), // 2 shingles, both inside doc 2
      (2L, "intro words first alpha beta gamma delta and then a very long tail " +
        "of unrelated filler content extending the union far beyond the quote " +
        "so the jaccard score collapses toward zero for this pair")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(d2, "doc_id", "text", n = 3, threshold = 0.9)
      .collect()
    assert(cont.length == 1)
    val r = cont(0)
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Double]("cont_a_in_b") == 1.0, "all of doc 1's shingles are in doc 2")
    assert(r.getAs[Double]("cont_b_in_a") < 0.5)
    // jaccard at the same candidate set stays far below the containment
    val j = Dedup.jaccardPairs(d2, "doc_id", "text", n = 3, threshold = 0.9).collect()
    assert(j.isEmpty, "jaccard must NOT reach 0.9 on the embedded quote")
  }

  test("minhash LSH pairs always include exact duplicates") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L))) // identical signatures land in every band together
  }

  test("simhash of identical content is identical; different content differs") {
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
  }

  test("simhashPairs rejects maxDist beyond the pigeonhole guarantee") {
    intercept[IllegalArgumentException](
      Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 4))
  }

  test("simhashPairs equals the brute-force hamming join (blocking is lossless)") {
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash"))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h)).toSet
    val blocked = Dedup.simhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))).toSet
    assert(blocked == brute)
  }

  test("simhashPairs reports hamming 0 for exact dups under default maxDist") {
    val p = Dedup.simhashPairs(docs, "doc_id", "text")
      .collect().map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")), r.getAs[Long]("hamming"))).toMap
    assert(p.get((1L, 2L)).contains(0L))
  }

  test("dupClusters collapses a transitive chain to one representative") {
    // pair graph: 1-2, 2-3 (chain), 5-6 (separate), 4 isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val all = (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val reps = Dedup.dupClusters(pairs, all, "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rep_id")).toMap
    assert(reps(1L) == 1L && reps(2L) == 1L && reps(3L) == 1L)
    assert(reps(5L) == 5L && reps(6L) == 5L)
    assert(reps(4L) == 4L) // singleton maps to itself
  }

  test("dupClusters handles cycles and long chains (propagation, not one hop)") {
    // 10-node path 1-2-...-10 plus a closing edge 10-1: diameter > 1 round
    val edges = (1L until 10L).map(i => (i, i + 1)) :+ ((10L, 1L): (Long, Long))
    val pairs = edges.toDF("doc_a", "doc_b")
    val all = (1L to 10L).map(i => (i, "x")).toDF("doc_id", "text")
    val reps = Dedup.dupClusters(pairs, all, "doc_id")
      .collect().map(r => r.getAs[Long]("rep_id")).toSet
    assert(reps == Set(1L))
  }

  test("dupClusters with no pairs maps every doc to itself") {
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val all = (1L to 4L).map(i => (i, "x")).toDF("doc_id", "text")
    val reps = Dedup.dupClusters(pairs, all, "doc_id").collect()
    assert(reps.forall(r => r.getAs[Long]("doc_id") == r.getAs[Long]("rep_id")))
    assert(reps.length == 4)
  }

  test("contamination counts distinct shared n-grams, probe side excluded") {
    // probe doc 100 has grams "a b c", "b c d"; doc 1 shares both, doc 2
    // shares one, doc 3 shares none; repeated grams count once (distinct)
    val probes = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c d x"),          // both probe 3-grams
      (2L, "x a b c y"),          // "a b c" only
      (3L, "p q r s"),            // none
      (4L, "a b c z a b c")       // "a b c" twice -> counts once
    ).toDF("doc_id", "text")
    val out = Dedup.contamination(docs, probes, "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit_grams")).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 4L -> 1L))
  }

  test("contamination with an empty probe set flags nothing") {
    val probes = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    assert(Dedup.contamination(docs, probes, "doc_id", "text", n = 3).collect().isEmpty)
  }

  test("clusterKeep keeps the best-quality member, lowest id on ties") {
    // cluster rep 1 = {1,2,3} with qualities 5,9,9 → keep 2 (tie 2 < 3);
    // singleton 4 keeps itself
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L)).toDF("doc_id", "rep_id")
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 7L)).toDF("doc_id", "n_chars")
    val kept = Dedup.clusterKeep(clusters, docs, "doc_id", "n_chars")
      .collect().map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("keep_id"), r.getAs[Long]("best_quality"), r.getAs[Long]("n_members")))).toMap
    assert(kept(1L) == ((2L, 9L, 3L)))
    assert(kept(4L) == ((4L, 7L, 1L)))
    assert(kept.size == 2)
  }

  test("chunkDedup drops corpus-frequent chunks and hashes the rewritten doc") {
    import spark.implicits._
    // chunkTokens=2, maxDocs=2: "shared boiler" appears in 3 docs → dropped
    // everywhere; "unique text"/"other words"/"third thing" survive
    val d = Seq(
      (1L, "shared boiler unique text"),
      (2L, "shared boiler other words"),
      (3L, "shared boiler third thing"),
      (4L, "standalone content entirely")
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(d, "doc_id", "text", chunkTokens = 2, maxDocs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dropped"), r.getAs[String]("clean_md5"))))
      .toMap
    assert(out(1L)._1 == 2 && out(1L)._2 == 1)
    assert(out(4L)._2 == 0)
    // the rewritten content hash is the md5 of the KEPT chunks in order
    def md5(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(out(1L)._3 == md5("unique text"))
    assert(out(4L)._3 == md5("standalone content entirely"))
  }

  test("chunkDedup: a doc whose every chunk is boilerplate hashes empty") {
    import spark.implicits._
    val d = Seq(
      (1L, "same same"), (2L, "same same"), (3L, "same same"), (4L, "same same")
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(d, "doc_id", "text", chunkTokens = 2, maxDocs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_dropped"), r.getAs[String]("clean_md5")))).toMap
    def md5(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(out.values.forall(_ == ((1L, md5("")))))
  }

  test("sortedNeighborPairs: prefix-sharing near-dups land adjacent and pair up") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma epsilon"), // same 12-char prefix as 1 → adjacent
      (3L, "zebra yak xylophone"),      // far away in sort order
      (4L, "")                          // token-less: dropped before ranking
    ).toDF("doc_id", "text")
    val pairs = Dedup.sortedNeighborPairs(d, "doc_id", "text",
      window = 2, keyLen = 12, threshold = 0.3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs == Set((1L, 2L))) // 3 is within w of 2 but dissimilar; 4 absent
  }

  test("sortedNeighborPairs: doc_a precedes doc_b and gap bounded by window") {
    import spark.implicits._
    val d = (1L to 40L).map(i => (i, s"common shared prefix words item$i"))
      .toDF("doc_id", "text")
    val rows = Dedup.sortedNeighborPairs(d, "doc_id", "text",
      window = 4, keyLen = 12, threshold = 0.1).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gap = r.getAs[Long]("gap")
      assert(gap >= 1L && gap <= 3L)
      assert(r.getAs[Double]("jaccard") >= 0.1)
    }
    // identical prefixes sort by doc_id, so every (a, a+1) must appear
    val got = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    (1L to 39L).foreach(i => assert(got.contains((i, i + 1L))))
  }

  test("incrementalLshPairs: incremental ∪ base-only pairs == full recompute") {
    val sf = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = sf.filter(col("doc_id") % 10 =!= 0)
    val delta = sf.filter(col("doc_id") % 10 === 0)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val full = pairSet(Dedup.minhashLshPairs(sf, "doc_id", "text"))
    val old = pairSet(Dedup.minhashLshPairs(base, "doc_id", "text"))
    val inc = pairSet(Dedup.incrementalLshPairs(base, delta, "doc_id", "text"))
    assert(old.subsetOf(full))
    assert((old ++ inc) === full, "incremental pairs must complete the old index")
    // every incremental pair touches the delta
    assert(inc.forall { case (a, b) => a % 10 == 0 || b % 10 == 0 })
    assert(inc.intersect(old).isEmpty)
  }
}
