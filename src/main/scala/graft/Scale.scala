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
    // sized so the larger point is COMPUTE-bound (128M pairs), not
    // job-overhead-bound — otherwise its time exponent under-reads
    val bruteScales = scalesEnv("SPARK_GRAFT_SCALE_BRUTE", Seq(4000L, 16000L))

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

    // per (operator, n): generation is cached OUTSIDE the timed section;
    // the measured body runs twice, min taken (damps JIT/GC noise).
    // Deterministic side measurements (candidate counts) go in `once` —
    // they'd otherwise re-run full-corpus jobs per rep for no benefit.
    def measure(mk: () => DataFrame, run: DataFrame => Point,
                once: DataFrame => Long = _ => -1L): Point = {
      val in = mk()
      try {
        val cand = once(in)
        val a = run(in); val b = run(in)
        val best = if (a.sec <= b.sec) a else b
        best.copy(candidates = cand)
      } finally in.unpersist()
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Seq[Point]]()

    // ---- MinHash-LSH near-dup pairs -----------------------------------
    results("d_minhash_pairs (MinHash-LSH)") = docScales.map { n =>
      measure(() => cachedDocs(n), { docs =>
        val (rows, sec) = timeIt(
          graft.dedup.Dedup.minhashLshPairs(docs, "doc_id", "text").count())
        Point(n, sec, rows, -1L)
      }, once = { docs =>
        // candidate pairs = Σ (bucket size choose 2) over (band, bucket):
        // exactly what the band join materializes before the pair dedup
        graft.dedup.Dedup
          .minhashBandsPerRow(docs, "doc_id", "text")
          .groupBy("band", "bucket").agg(count(lit(1)).as("c"))
          .agg(sum((col("c") * (col("c") - 1) / 2).cast("long")).as("cand"))
          .collect()(0).getLong(0)
      })
    }

    // ---- prefix-filter Jaccard set-similarity join --------------------
    results("d_prefix_jaccard (PPJoin prefix filter)") = docScales.map { n =>
      measure(() => cachedDocs(n), { docs =>
        val (pair, release) = graft.dedup.Dedup
          .prefixJaccardPairsReleasable(docs, "doc_id", "text", threshold = 0.9)
        val (rows, sec) = timeIt(pair.count())
        release()
        Point(n, sec, rows, -1L)
      }, once = { docs =>
        // candidate upper bound the prefix index admits: Σ (posting-list
        // size choose 2) over indexed prefix tokens (before size filter)
        val toks = docs.select(col("doc_id").as("_id"),
          explode(array_distinct(graft.text.TextOps.tokens(col("text")))).as("tok"))
        val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("_df"))
        val ordered = toks.join(dfreq, "tok")
          .groupBy("_id")
          .agg(sort_array(collect_list(struct(col("_df"), col("tok")))).as("_ord"))
          .select(col("_id"),
            transform(col("_ord"), x => x.getField("tok")).as("_toks"),
            size(col("_ord")).as("_sz"))
        val prefLen = (col("_sz") - ceil(col("_sz") * lit(0.9)).cast("int") + 1)
        ordered
          .select(explode(slice(col("_toks"), lit(1), prefLen)).as("ptok"))
          .groupBy("ptok").agg(count(lit(1)).as("c"))
          .agg(sum((col("c") * (col("c") - 1) / 2).cast("long")).as("cand"))
          .collect()(0).getLong(0)
      })
    }

    // ---- SimHash near-dup pairs (pigeonhole chunk blocking) -----------
    results("d_simhash_pairs (SimHash pigeonhole)") = docScales.map { n =>
      measure(() => cachedDocs(n), { docs =>
        val (rows, sec) = timeIt(
          graft.dedup.Dedup.simhashPairs(docs, "doc_id", "text").count())
        Point(n, sec, rows, -1L)
      })
    }

    // ---- embedding near-dup (RHP-LSH banding) -------------------------
    // the bucket space is SIZED TO THE CORPUS (the FAISS-nlist parameter
    // discipline): target ~32 vectors per band-bucket. This is the
    // harness's first real catch — with the fixed 6-bit default the
    // candidate join is Θ(n²/2⁶) and at 200k vectors it spilled the
    // machine's disk; with log-sized buckets it is near-linear. The
    // sizing rule is documented on rhpNearDupPairs.
    results("d_embed_neardup (RHP-LSH, corpus-sized buckets)") = embScales.map { n =>
      val bits = math.max(6, math.ceil(
        math.log(n / 32.0) / math.log(2.0)).toInt)
      measure(() => cachedEmb(n), { emb =>
        val (rows, sec) = timeIt(
          graft.sim.Similarity.rhpNearDupPairs(emb, "vec_id", "embedding",
            dim = 64, threshold = 0.9, bitsPerBand = bits).count())
        Point(n, sec, rows, -1L)
      })
    }

    // ---- PassJoin edit-distance fuzzy keys ----------------------------
    results("d_editdist_pairs (PassJoin segments)") = docScales.map { n =>
      measure(() => cachedKeys(n), { keys =>
        val (rows, sec) = timeIt(
          graft.dedup.Dedup.editDistancePairs(keys, "key", maxDist = 2).count())
        Point(n, sec, rows, -1L)
      })
    }

    // ---- IVF-PQ ANN ----------------------------------------------------
    results("sim_ivfpq_topk (IVF-PQ + rerank)") = embScales.map { n =>
      measure(() => cachedEmb(n), { emb =>
        val (rows, sec) = timeIt(
          graft.sim.Quantized.ivfPqTopK(emb, "vec_id", "embedding",
            dim = 64, m = 8, nCodes = 16, nPivots = 16, nprobe = 2,
            nQueries = 10, rerank = 20, k = 5).count())
        Point(n, sec, rows, -1L)
      })
    }

    // ---- curation funnel ------------------------------------------------
    results("pipeline_curation (staged funnel)") = docScales.map { n =>
      measure(() => cachedDocs(n), { docs =>
        val (rows, sec) = timeIt(
          graft.text.Curation.funnel(
            docs.filter(col("doc_id") % 100 =!= 0),
            docs.filter(col("doc_id") % 100 === 0),
            "doc_id", "text",
            minTokens = 15, maxTokens = 100000,
            minMeanLen = 2.0, maxMeanLen = 8.0, minTtr = 0.2).count())
        Point(n, sec, rows, -1L)
      })
    }

    // ---- the quadratic counter-baseline --------------------------------
    results("sim_cosine_pairs (exact all-pairs — the O(n²) oracle tier)") =
      bruteScales.map { n =>
        measure(() => cachedEmb(n), { emb =>
          val (rows, sec) = timeIt(
            graft.sim.Similarity.cosinePairs(emb, "vec_id", "embedding",
              threshold = 0.8).count())
          Point(n, sec, rows, -1L)
        }, once = _ => n * (n - 1) / 2)
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
    sb.append("\nGrowth-bound contract: the banded family's CANDIDATE counts are\n")
    sb.append("additionally spec-pinned (ScaleSpec) at 1×/10× so a regression that\n")
    sb.append("densifies a banding (e.g. a fixed-width bucket collapsing) fails the\n")
    sb.append("suite, not just this artifact.\n\n")
    sb.append("Findings this harness already produced: (1) RHP-LSH's bucket space\n")
    sb.append("must be sized to the corpus (FAISS-nlist discipline) — the fixed\n")
    sb.append("6-bit default is Θ(n²/2⁶) and spilled ~80 GB at 200k vectors; the\n")
    sb.append("sizing rule (bitsPerBand ≈ log2(n/32)) is now documented on\n")
    sb.append("rhpNearDupPairs and used above. (2) Concentrating stopword mass in\n")
    sb.append("5 marker types biased SimHash's majority bits into hot pigeonhole\n")
    sb.append("buckets at 500k docs — a data-realism artifact (real stopword mass\n")
    sb.append("spreads over hundreds of types), fixed in the generator and worth\n")
    sb.append("knowing: SimHash blocking degrades on template-heavy corpora.\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(sb.toString)
    spark.stop()
  }
}
