package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-growth measurement harness: runs the banded/inverted-list
  * operator family on [[graft.sources.ScaleSynth]] corpora at 1×/10×/100×
  * (zero files — pure hash arithmetic, the MimicSynth pattern) and fits
  * each operator's wall-time and candidate-count growth exponents from a
  * log-log least-squares line. Writes SCALE.md.
  *
  * The claim under test: every near-dup/ANN operator the engine ships is
  * banded/blocked so its cost grows NEAR-LINEARLY in corpus size (fitted
  * exponent well under the all-pairs 2.0), which is the difference
  * between "works at sf0.1" and "survives 100 TB". The quadratic
  * exactness tier (brute-force cosine all-pairs) is measured at small
  * scales as the counter-baseline — its measured exponent ≈ 2.
  *
  * Usage: `sbt "runMain graft.Scale [SCALE.md]"` (≈ minutes; the 100×
  * corpus is 500k docs / 200k embeddings).
  */
object Scale {

  private case class Point(n: Long, sec: Double, outRows: Long, candidates: Long)

  /** Least-squares slope of log(y) on log(n) — the growth exponent. */
  private def exponent(pts: Seq[(Long, Double)]): Double = {
    val xs = pts.map(p => math.log(p._1.toDouble))
    val ys = pts.map(p => math.log(math.max(p._2, 1e-9)))
    val mx = xs.sum / xs.size; val my = ys.sum / ys.size
    val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val den = xs.map(x => (x - mx) * (x - mx)).sum
    if (den == 0.0) 0.0 else num / den
  }

  private def timeIt[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val outPath = if (args.nonEmpty) args(0) else "SCALE.md"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def scalesEnv(name: String, default: Seq[Long]): Seq[Long] =
      sys.env.get(name).map(_.split(",").map(_.trim.toLong).toSeq).getOrElse(default)
    val docScales = scalesEnv("SPARK_GRAFT_SCALE_DOCS", Seq(5000L, 50000L, 500000L))
    val embScales = scalesEnv("SPARK_GRAFT_SCALE_EMBS", Seq(2000L, 20000L, 200000L))
    // the quadratic tier is measured only at small n (that is the point);
    // sized so BOTH points are COMPUTE-bound (32M / 512M pairs — ~0.3 s of
    // Spark job overhead under-reads the exponent when a point's true
    // compute is comparable to it)
    val bruteScales = scalesEnv("SPARK_GRAFT_SCALE_BRUTE", Seq(8000L, 32000L))

    def cachedDocs(n: Long): DataFrame = {
      val d = graft.sources.ScaleSynth.documents(spark, n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count(); d
    }
    def cachedEmb(n: Long): DataFrame = {
      val e = graft.sources.ScaleSynth.embeddings(spark, n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    def cachedKeys(n: Long): DataFrame = {
      val k = graft.sources.ScaleSynth.keys(spark, n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      k.count(); k
    }

    // An operator under measurement: `run` is timed (twice, min taken —
    // damps JIT/GC noise); `once` carries deterministic side measurements
    // (candidate counts) that would otherwise re-run full-corpus jobs per
    // rep for no benefit. Corpora are generated and cached ONCE PER SCALE
    // and shared by every operator at that scale — generation (the
    // per-word hash draws) is the harness's cost center.
    case class Op(name: String,
                  run: DataFrame => (Long, Double),
                  once: DataFrame => Long = _ => -1L)

    def measureAll(scales: Seq[Long], mk: Long => DataFrame, ops: Seq[Op],
                   results: scala.collection.mutable.LinkedHashMap[String, Seq[Point]]): Unit = {
      ops.foreach(op => if (!results.contains(op.name)) results(op.name) = Seq())
      scales.foreach { n =>
        val in = mk(n)
        try ops.foreach { op =>
          val cand = op.once(in)
          val (r1, s1) = op.run(in)
          val (r2, s2) = op.run(in)
          val p = if (s1 <= s2) Point(n, s1, r1, cand) else Point(n, s2, r2, cand)
          results(op.name) = results(op.name) :+ p
        } finally in.unpersist()
      }
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Seq[Point]]()

    val docOps = Seq(
      Op("d_minhash_pairs (MinHash-LSH)",
        run = docs => timeIt(
          graft.dedup.Dedup.minhashLshPairs(docs, "doc_id", "text").count()),
        // candidate pairs = Σ (bucket size choose 2) over (band, bucket):
        // exactly what the band join materializes before the pair dedup
        once = docs => graft.dedup.Dedup
          .minhashBandsPerRow(docs, "doc_id", "text")
          .groupBy("band", "bucket").agg(count(lit(1)).as("c"))
          .agg(sum((col("c") * (col("c") - 1) / 2).cast("long")).as("cand"))
          .collect()(0).getLong(0)),
      Op("d_prefix_jaccard (PPJoin prefix+size+positional filters)",
        run = docs => {
          val (pair, release) = graft.dedup.Dedup
            .prefixJaccardPairsReleasable(docs, "doc_id", "text", threshold = 0.9)
          val out = timeIt(pair.count())
          release()
          out
        },
        // the pre-distinct match rows the operator's OWN filter chain
        // admits into verification (prefix + size + positional, r11) —
        // measured by the operator's instrumentation hook so the number
        // cannot drift from the join's real cost
        once = docs => graft.dedup.Dedup
          .prefixJaccardCandidateCount(docs, "doc_id", "text", threshold = 0.9)),
      Op("d_simhash_pairs (SimHash pigeonhole)",
        run = docs => timeIt(
          graft.dedup.Dedup.simhashPairs(docs, "doc_id", "text").count())),
      Op("pipeline_curation (staged funnel)",
        run = docs => timeIt(
          graft.text.Curation.funnel(
            docs.filter(col("doc_id") % 100 =!= 0),
            docs.filter(col("doc_id") % 100 === 0),
            "doc_id", "text",
            minTokens = 15, maxTokens = 100000,
            minMeanLen = 2.0, maxMeanLen = 8.0, minTtr = 0.2).count())))
    measureAll(docScales, cachedDocs, docOps, results)

    // the bucket space is SIZED TO THE CORPUS (the FAISS-nlist parameter
    // discipline): target ~32 vectors per band-bucket. This is the
    // harness's first real catch — with the fixed 6-bit default the
    // candidate join is Θ(n²/2⁶) and at 200k vectors it spilled the
    // machine's disk; with log-sized buckets it is near-linear. Since
    // r11 the operator derives the width ITSELF when no explicit
    // bitsPerBand is passed (Similarity.autoBitsPerBand) — this harness
    // exercises the default exactly as a caller would.
    val embOps = Seq(
      Op("d_embed_neardup (RHP-LSH, corpus-sized buckets)",
        run = emb =>
          timeIt(graft.sim.Similarity.rhpNearDupPairs(emb, "vec_id", "embedding",
            dim = 64, threshold = 0.9).count())),
      Op("sim_ivfpq_topk (IVF-PQ + rerank)",
        run = emb => timeIt(
          graft.sim.Quantized.ivfPqTopK(emb, "vec_id", "embedding",
            dim = 64, m = 8, nCodes = 16, nPivots = 16, nprobe = 2,
            nQueries = 10, rerank = 20, k = 5).count())))
    measureAll(embScales, cachedEmb, embOps, results)

    measureAll(docScales, cachedKeys, Seq(
      Op("d_editdist_pairs (PassJoin segments)",
        run = keys => timeIt(
          graft.dedup.Dedup.editDistancePairs(keys, "key", maxDist = 2).count()))),
      results)

    // ---- the quadratic counter-baseline --------------------------------
    measureAll(bruteScales, cachedEmb, Seq(
      Op("sim_cosine_pairs (exact all-pairs — the O(n²) oracle tier)",
        run = emb => timeIt(
          graft.sim.Similarity.cosinePairs(emb, "vec_id", "embedding",
            threshold = 0.8).count()),
        once = emb => { val n = emb.count(); n * (n - 1) / 2 })),
      results)

    // ---- iterated-join graph family (r11): the cost axis is EDGES ------
    // constant mean degree (nodes = edges/8), so density stays fixed and
    // the fit isolates size growth. Each op is a bounded number of
    // edge-keyed shuffle rounds — expected exponent ≈ 1.
    val edgeScales = scalesEnv("SPARK_GRAFT_SCALE_EDGES",
      Seq(20000L, 200000L, 2000000L))
    def cachedEdges(n: Long): DataFrame = {
      val e = graft.sources.ScaleSynth.edges(spark, n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    val graphOps = Seq(
      Op("g_pagerank3 (3 damped Pregel-unrolled iterations)",
        run = e => {
          val (pr, release) = graft.ops.PageRank
            .fixedPointReleasable(e, "src", "dst", iters = 3)
          val out = timeIt(pr.count())
          release()
          out
        }),
      Op("g_bfs_dist (3-hop BFS from a 1/97 seed set)",
        run = e => {
          val n = e.count() // cached — a metadata-cheap read, outside the timer
          val seeds = graft.sources.ScaleSynth.edgeNodes(e.sparkSession, n)
            .filter(col("node_id") % 97 === 0)
          timeIt(graft.ops.Bfs.kHopDistances(e, "src", "dst",
            seeds, "node_id", maxHops = 3).count())
        }),
      Op("g_components (min-label pointer jumping)",
        run = e => {
          val n = e.count()
          val nodes = graft.sources.ScaleSynth.edgeNodes(e.sparkSession, n)
          timeIt(graft.dedup.Dedup.dupClusters(
            e.select(least(col("src"), col("dst")).as("doc_a"),
              greatest(col("src"), col("dst")).as("doc_b")),
            nodes, "node_id").count())
        }))
    measureAll(edgeScales, cachedEdges, graphOps, results)

    // ---- streaming near-dup drain (r11): the cost axis is BATCHES ------
    // fixed 5k-doc micro-batches, so 1×/10×/100× corpora run 1/10/100
    // batches through the flatMapGroupsWithState band-bucket state
    // machine. Near-linear wall growth = per-batch cost stays O(batch +
    // state-commit); state itself is O(buckets seen), which grows with
    // the corpus — if store maintenance cost compounds per batch, the
    // fit catches it (that is this harness's job).
    {
      val streamScales = scalesEnv("SPARK_GRAFT_SCALE_STREAM",
        Seq(5000L, 50000L, 500000L))
      val name = "d_stream_neardup (drain, 5k-doc micro-batches)"
      if (!results.contains(name)) results(name) = Seq()
      streamScales.foreach { n =>
        val batches = math.max(1L, n / 5000L).toInt
        val dir = java.nio.file.Files.createTempDirectory(s"graft_scale_stream_$n")
        try {
          graft.sources.ScaleSynth.documents(spark, n)
            .repartition(batches).write.mode("overwrite").parquet(dir.toString)
          def drain(tag: String): (Long, Double) = timeIt(
            graft.streaming.StreamOps.nearDupDrainDir(
              spark, dir.toString, s"graft_scale_neardup_${n}_$tag",
              filesPerTrigger = 1).count())
          // min-of-2 at the small scales only: the 100-batch drain is
          // minutes long and batch-dominated (JIT noise is amortized)
          val (r1, s1) = drain("a")
          val p = if (batches >= 100) Point(n, s1, r1, batches.toLong)
          else {
            val (r2, s2) = drain("b")
            if (s1 <= s2) Point(n, s1, r1, batches.toLong)
            else Point(n, s2, r2, batches.toLong)
          }
          results(name) = results(name) :+ p
        } finally {
          import scala.jdk.CollectionConverters._
          val walk = java.nio.file.Files.walk(dir)
          try walk.iterator().asScala.toSeq
            .sortBy(-_.getNameCount).foreach(java.nio.file.Files.delete)
          finally walk.close()
        }
      }
    }

    // ---- the MIMIC flagship at 10× admissions (r11) --------------------
    // MimicSynth.*At(f) scales every block constant linearly (proportions
    // preserved — see the generator's scaladoc), so the fit measures the
    // reference pipeline's own shape: the cohort-window + join relational
    // prefix and the full tokenize→vocab→BoW→assemble matrix build.
    {
      val mimicScales = scalesEnv("SPARK_GRAFT_SCALE_MIMIC", Seq(1L, 10L))
      val nameR = "mimic modeling rows (cohort windows + joins + split)"
      val nameM = "mimic matrix build (tokenize→top-3000 vocab→BoW→assemble)"
      Seq(nameR, nameM).foreach(k => if (!results.contains(k)) results(k) = Seq())
      mimicScales.foreach { f =>
        val nAdm = graft.sources.MimicSynth.N_ADM * f
        def rowsOnce(): (Long, Double) = timeIt(
          graft.sources.MimicSynth.modelingRowsAt(spark, f)
            .groupBy("label", "split").count().count())
        val (c1, t1) = rowsOnce(); val (c2, t2) = rowsOnce()
        results(nameR) = results(nameR) :+
          (if (t1 <= t2) Point(nAdm, t1, c1, -1L) else Point(nAdm, t2, c2, -1L))
        // the matrix build is measured ONCE per scale (it is itself a
        // multi-pass pipeline; its internal persists amortize JIT) and
        // unpersisted immediately — the memoized f=1 session copy is not
        // touched
        val (mRows, mSec) = timeIt {
          val m = graft.pipeline.MimicPipeline.assembledAt(spark, f)
          val c = m.count(); m.unpersist(); c
        }
        results(nameM) = results(nameM) :+ Point(nAdm, mSec, mRows, -1L)
      }
    }

    // ---- render ---------------------------------------------------------
    val sb = new StringBuilder
    sb.append("# SCALE — measured growth exponents (generated by `graft.Scale`)\n\n")
    sb.append(s"Corpora: `ScaleSynth` hash-arithmetic documents/embeddings at ")
    sb.append(s"${docScales.mkString(" / ")} docs (embeddings ${embScales.mkString(" / ")}),\n")
    sb.append("zero files, bit-reproducible at any size. 10% planted near-duplicates\n")
    sb.append("(constant rate → true pairs grow linearly by construction); vocabulary\n")
    sb.append("grows with the corpus (Heaps' law, V = max(2000, n/2)) — with a FIXED\n")
    sb.append("vocabulary ANY inverted-index join densifies toward Θ(n²/V), a data\n")
    sb.append("property, not an algorithm property. Machine: local[" + cpus + "], ")
    sb.append("timings are min-of-2 on a cached input (generation excluded).\n\n")
    sb.append("| operator | n | wall (s) | output rows | candidate pairs |\n")
    sb.append("|---|---:|---:|---:|---:|\n")
    results.foreach { case (name, pts) =>
      pts.foreach { p =>
        val cand = if (p.candidates < 0) "—" else p.candidates.toString
        sb.append(f"| $name | ${p.n}%,d | ${p.sec}%.2f | ${p.outRows}%,d | $cand |\n")
      }
    }
    sb.append("\n## Fitted exponents (log-log least squares)\n\n")
    sb.append("| operator | time exponent | candidate exponent | verdict |\n")
    sb.append("|---|---:|---:|---|\n")
    results.foreach { case (name, pts) =>
      val te = exponent(pts.map(p => p.n -> p.sec))
      val ce = if (pts.forall(_.candidates >= 0))
        f"${exponent(pts.map(p => p.n -> p.candidates.toDouble))}%.2f" else "—"
      val quadratic = name.contains("O(n²)")
      val verdict =
        if (quadratic) "quadratic by design (exactness baseline)"
        else if (te < 1.3) "near-linear — survives 100×"
        else "SUPRA-LINEAR — investigate"
      sb.append(f"| $name | $te%.2f | $ce | $verdict |\n")
    }
    sb.append("\nAxes per family: dedup/ANN rows grow the CORPUS; graph rows grow\n")
    sb.append("EDGES at constant mean degree (density fixed, so the fit isolates\n")
    sb.append("size); the stream row grows MICRO-BATCH COUNT at fixed batch size\n")
    sb.append("(its candidate column = batches); the MIMIC rows grow ADMISSIONS\n")
    sb.append("via the linearly-scaled MimicSynth At(f) generators (1×/10× only —\n")
    sb.append("two points give the slope, not a curvature check).\n\n")
    sb.append("Growth-bound contract: the banded family's CANDIDATE counts are\n")
    sb.append("additionally spec-pinned (ScaleSpec) at 1×/10× so a regression that\n")
    sb.append("densifies a banding (e.g. a fixed-width bucket collapsing) fails the\n")
    sb.append("suite, not just this artifact; since r11 the prefix join's\n")
    sb.append("candidate:pair ratio is pinned under 1000:1 at SCALE.md's own\n")
    sb.append("5k/50k tiers.\n\n")
    sb.append("Findings this harness already produced: (1) RHP-LSH's bucket space\n")
    sb.append("must be sized to the corpus (FAISS-nlist discipline) — the fixed\n")
    sb.append("6-bit default is Θ(n²/2⁶) and spilled ~80 GB at 200k vectors; the\n")
    sb.append("sizing rule (≈ log2(n/32) bits) is since r11 DERIVED IN CODE by\n")
    sb.append("rhpNearDupPairs when no width is passed (autoBitsPerBand), which is\n")
    sb.append("how this harness calls it. (2) Concentrating stopword mass in\n")
    sb.append("5 marker types biased SimHash's majority bits into hot pigeonhole\n")
    sb.append("buckets at 500k docs — a data-realism artifact (real stopword mass\n")
    sb.append("spreads over hundreds of types), fixed in the generator and worth\n")
    sb.append("knowing: SimHash blocking degrades on template-heavy corpora.\n")
    sb.append("(3) r11: the PPJoin positional filter + asymmetric short index\n")
    sb.append("prefix cut the prefix join's admitted match rows ~5.6× (1.13M →\n")
    sb.append("203k at 5k docs; candidate:pair ≈ 430:1, was ~2,400:1) with the\n")
    sb.append("verified pairs — and the d_prefix_jaccard oracle hash — unchanged.\n")
    sb.append("(4) r11: candidate growth measured BELOW the generator's 2,000-type\n")
    sb.append("vocabulary floor is data-quadratic (posting lists densify ∝ n²/V);\n")
    sb.append("growth claims are only meaningful on the Heaps-law leg (≥ 4k docs).\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(sb.toString)
    spark.stop()
  }
}
