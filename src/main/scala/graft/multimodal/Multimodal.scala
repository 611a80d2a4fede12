package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata
  * structs, with decode/feature-extraction as per-partition batch
  * operators.
  *
  * Design for 100 TB: the payload column stays opaque bytes end-to-end —
  * Parquet stores it page-compressed, Catalyst prunes it whenever a query
  * doesn't touch it, and decode happens per-partition (batched) so a real
  * decoder (image/audio lib) amortizes initialization per partition, not
  * per row. The decode step itself is a clearly-marked deterministic STUB
  * (no media libs in this container, SURVEY-prompt contract); everything
  * around it — schema, batching, partitioning, output shape — is real.
  */
object Multimodal {

  /** Dirs whose staged contents were validated (or written) by THIS JVM —
    * see stageAsFiles' skip logic.
    */
  private val validatedDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  val metaSchema: StructType = StructType(Seq(
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)
  ))

  /** Stage each row's payload as an individual `<id>.bin` FILE (executor-
    * side, per-partition — nothing funnels through the driver) and read the
    * directory back through Spark's `binaryFile` source. This is the real
    * media-ingestion path: a directory of image/audio files → (path,
    * length, content) rows → the engine's binary-table shape. On a cluster
    * `dir` is shared storage; in tests it's a local temp dir.
    */
  def stageAsFiles(
      df: DataFrame, idCol: String, textCol: String, dir: String,
      skipIfStaged: Boolean = false): Unit = {
    val p = java.nio.file.Paths.get(dir)
    val marker = p.resolve("_STAGED")
    // repeat invocations on the same (deterministic) dataset can skip the
    // per-row file rewrite — the source-read path is what the query
    // measures. Within one JVM a validated dir is memoized so bench reps
    // don't pay a count() job per rep just to re-validate; across JVMs the
    // marker records the staged row count, so a regenerated dataset under
    // the same dir name (different cardinality) re-stages instead of
    // silently serving stale files. (A same-count content change still
    // needs the marker dir cleared — tmp dirs, not a cache contract.)
    if (skipIfStaged && validatedDirs.contains(dir)) return
    val expected = df.filter(col(textCol).isNotNull).count()
    if (skipIfStaged && java.nio.file.Files.exists(marker) &&
        new String(java.nio.file.Files.readAllBytes(marker),
          java.nio.charset.StandardCharsets.UTF_8) == expected.toString) {
      validatedDirs.add(dir); return
    }
    java.nio.file.Files.createDirectories(p)
    // invalidate FIRST: if the rewrite below is interrupted, a stale marker
    // with a matching row count would let a later skipIfStaged run serve a
    // partially-staged directory as valid
    java.nio.file.Files.deleteIfExists(marker)
    // clear previous stagings: stale .bin files from an earlier (different)
    // dataset would otherwise come back as phantom rows
    val old = java.nio.file.Files.list(p)
    try old.filter(_.toString.endsWith(".bin")).forEach(java.nio.file.Files.delete(_))
    finally old.close()
    df.select(col(idCol).cast("string"), col(textCol))
      .filter(col(textCol).isNotNull) // a null payload has no file representation
      .foreachPartition { rows: Iterator[Row] =>
        rows.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"${r.getString(0)}.bin"),
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
    java.nio.file.Files.write(marker,
      expected.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    validatedDirs.add(dir)
  }

  /** binaryFile scan → (id parsed from filename, payload, n_bytes).
    * Non-matching filenames are filtered BEFORE the cast (ANSI mode would
    * throw on CAST('' AS BIGINT) for a stray file in a shared directory);
    * the pattern keeps the sign so negative ids round-trip.
    */
  def readBinaryFiles(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .filter(col("path").rlike("(^|/)-?[0-9]+\\.bin$"))
      .select(
        regexp_extract(col("path"), "(-?[0-9]+)\\.bin$", 1).cast("long").as("doc_id"),
        col("content").as("payload"),
        length(col("content")).cast("int").as("n_bytes"))

  /** Wrap a string column as a (payload: binary, meta: struct) pair —
    * the canonical multimodal row shape. In production the payload comes
    * off object storage; here it is synthesized from text so the plumbing
    * is exercised end-to-end.
    */
  def toBinaryTable(df: DataFrame, idCol: String, textCol: String, modality: String): DataFrame =
    df.select(
      col(idCol),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit(modality).as("modality"),
        octet_length(col(textCol).cast("binary")).as("n_bytes"),
        crc32(col(textCol).cast("binary")).as("checksum")
      ).as("meta"))

  /** ==== STUB DECODER ====
    * Stands in for an image/audio decode (PIL/ffmpeg-style). Produces a
    * deterministic fixed-width "feature vector" from the payload bytes:
    * byte-histogram moments — so specs can pin exact outputs. A real
    * decoder drops in here with the same (Iterator[Row] => Iterator[Row])
    * batch signature.
    */
  private def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null || bytes.isEmpty) return out
    var i = 0
    while (i < bytes.length) {
      out(java.lang.Byte.toUnsignedInt(bytes(i)) % dim) += 1.0f
      i += 1
    }
    var j = 0
    while (j < dim) { out(j) /= bytes.length; j += 1 }
    out
  }

  /** Per-partition batched decode → feature column. `mapPartitions` keeps
    * the (stub) decoder's init cost per-partition and the rows streaming.
    */
  def decodeFeatures(binTable: DataFrame, idCol: String, dim: Int = 16): DataFrame = {
    // carry the caller's id field through verbatim (any type) — hardcoding
    // LongType crashed for int/string ids and lied in the output schema
    val idField = binTable.schema(idCol)
    val schema = StructType(Seq(
      idField,
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)
    ))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    binTable.select(col(idCol), col("payload")).mapPartitions { rows =>
      // a real decoder initializes its native context HERE, once per partition
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        Row(r.get(0), stubDecode(payload, dim).toSeq)
      }
    }(enc)
  }

  /** Frame-sampling analog: deterministic byte-range samples of the
    * payload ("every k-th chunk"), the video-frame-extraction shape:
    * one input row → n (frame_idx, frame_bytes) rows via a generator.
    */
  def sampleChunks(binTable: DataFrame, idCol: String, chunkBytes: Int = 64, everyK: Int = 4): DataFrame = {
    val nChunks = ceil(octet_length(col("payload")).cast("double") / chunkBytes).cast("int")
    binTable
      .select(
        col(idCol),
        // empty/null payloads produce ZERO rows (posexplode of null drops
        // the row) — the old greatest(…, 0) guard emitted one phantom
        // empty chunk for a 0-byte payload
        posexplode(
          when(nChunks > 0,
            transform(
              sequence(lit(0), nChunks - 1),
              i => substring(col("payload"), i * chunkBytes + 1, lit(chunkBytes))
            ))
        ).as(Seq("chunk_idx", "chunk")))
      .filter(pmod(col("chunk_idx"), lit(everyK)) === 0)
      .select(col(idCol), col("chunk_idx"), col("chunk"), octet_length(col("chunk")).as("chunk_bytes"))
  }

  /** ==== PERCEPTUAL-HASH NEAR-DUP (pHash shape on the stub decode) ====
    * 60-bit positional-energy signature: the payload is cut into 60
    * positional buckets (byte i → bucket ⌊i·60/n⌋); bit k is set iff
    * bucket k's mean byte value exceeds the whole payload's mean. That is
    * exactly the aHash/pHash construction with "pixel luma" stubbed to
    * "byte value" (no image libs in this container) — a real decoder
    * swaps the byte stream for decoded luma and NOTHING else changes:
    * signature width, blocking, pair join, and oracle all stay.
    *
    * The mean comparison is cross-multiplied (`sum_k·n > total·cnt_k`) so
    * the signature is pure integer arithmetic — exactly mirrorable in
    * DuckDB from the hex dump of the same payload.
    */
  private def phash60(bytes: Array[Byte]): Long = {
    if (bytes == null || bytes.length == 0) return 0L
    val n = bytes.length
    val sums = new Array[Long](60)
    val cnts = new Array[Long](60)
    var total = 0L
    var i = 0
    while (i < n) {
      val b = java.lang.Byte.toUnsignedInt(bytes(i))
      val k = (i.toLong * 60L / n).toInt
      sums(k) += b; cnts(k) += 1; total += b
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 60) {
      if (sums(k) * n > total * cnts(k)) sig |= (1L << k)
      k += 1
    }
    sig
  }

  /** Per-partition batched signature extraction (same shape as
    * [[decodeFeatures]]): one (id, phash) row per payload.
    */
  def phashSignatures(binTable: DataFrame, idCol: String): DataFrame = {
    val idField = binTable.schema(idCol)
    val schema = StructType(Seq(idField, StructField("ph", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    binTable.select(col(idCol), col("payload")).mapPartitions { rows =>
      rows.map { r => Row(r.get(0), phash60(r.getAs[Array[Byte]](1))) }
    }(enc)
  }

  /** Near-dup payload pairs by pHash hamming distance ≤ maxDist, with the
    * recall-lossless 4×15-bit-chunk pigeonhole blocking (the
    * [[graft.dedup.Dedup.simhashPairs]] machinery applied to the media
    * signature): with 4 chunks and ≤ 3 differing bits at least one chunk
    * matches exactly, so a single equi-join finds every qualifying pair.
    */
  def phashPairs(binTable: DataFrame, idCol: String, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist < 4,
      s"phashPairs blocking is recall-lossless only for maxDist < 4; got $maxDist")
    phashPairsBlocked(binTable, idCol, maxDist, nChunks = 4)
  }

  /** Generalized recall-lossless pigeonhole blocking for pHash pairs at
    * corpus scale (the multi-index idea of Manku et al.'s web-scale
    * simhash dedup, WWW'07 §3): split the 60-bit signature into
    * `nChunks` equal pieces; ≤ `maxDist` differing bits touch at most
    * `maxDist` chunks, so every qualifying pair agrees EXACTLY on some
    * combination of `nChunks − maxDist` chunks — block on all
    * C(nChunks, nChunks−maxDist) combinations (key = signature masked to
    * the combo's chunks). `nChunks = maxDist + 1` is the single-chunk
    * pigeonhole [[phashPairs]] ships.
    *
    * The BLOCK-KEY WIDTH — (nChunks−maxDist)·(60/nChunks) bits — is the
    * random-collision control, and it must be sized to the corpus: a
    * fixed 15-bit key admits Θ(n²/2^15) ACCIDENTAL bucket collisions no
    * matter how discriminative the signature is (measured in the r12
    * scale band: candidates grew 124× over a 10× corpus at 15 bits —
    * SCALE.md finding #5). [[phashPairsAuto]] derives the width from the
    * corpus exactly like RHP-LSH's `autoBitsPerBand`. The trade is
    * replication: C(nChunks, nChunks−maxDist) block rows per doc
    * (4 → 4, 5 → 10, 6 → 20 at maxDist 3) — linear in n, against a
    * quadratic collision term.
    */
  def phashPairsBlocked(binTable: DataFrame, idCol: String,
                        maxDist: Int = 3, nChunks: Int = 4): DataFrame = {
    require(maxDist >= 0 && nChunks > maxDist && 60 % nChunks == 0,
      s"need 60 % nChunks == 0 and nChunks > maxDist (lossless pigeonhole); " +
        s"got nChunks=$nChunks maxDist=$maxDist")
    val w = 60 / nChunks
    val combos = (0 until nChunks).combinations(nChunks - maxDist).zipWithIndex
      .map { case (cs, idx) =>
        (idx, cs.map(c => ((1L << w) - 1L) << (c * w)).reduce(_ | _))
      }.toSeq
    // empty payloads have no signal — their all-zero sigs would pair every
    // empty doc with every other (hamming 0); exclude them up front
    val sigs = phashSignatures(
      binTable.filter(octet_length(col("payload")) > 0), idCol)
    val keyed = sigs.select(
      col(idCol).as("id"), col("ph"),
      explode(array(combos.map { case (idx, mask) =>
        struct(lit(idx).as("ci"), col("ph").bitwiseAND(lit(mask)).as("ck"))
      }: _*)).as("c"))
    val hamming = bit_count(col("a.ph").bitwiseXOR(col("b.ph")))
    keyed.as("a")
      .join(
        keyed.as("b"),
        col("a.c.ci") === col("b.c.ci") && col("a.c.ck") === col("b.c.ck") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Smallest admissible chunk count whose block-key width covers
    * log2(corpus) + 6 slack bits — the corpus-sizing rule that keeps the
    * accidental-collision term n²/2^width sub-linear in n.
    *
    * REPLICATION PRICE PER TIER (block rows per doc at maxDist=3 =
    * C(nChunks, nChunks−maxDist)): 4 → 4, 5 → 10, 6 → 20, **10 → 120,
    * 12 → 220**. The two upper tiers exist because key width shrinks as
    * chunks multiply — 10 chunks give a 7·6=42-bit key (admissible to
    * n ≈ 2^36), 12 chunks a 9·5=45-bit key — but their replication is no
    * longer a small constant: a caller landing there pays a 120–220×
    * explode, linear in n but with a big constant. That beats the
    * Θ(n²/2^width) collision floor of a too-narrow key (the r12 scale
    * band measured 124× candidate densification at a fixed 15-bit key),
    * yet it must never happen silently — [[phashPairsAuto]] logs a
    * warning whenever the selection crosses into the ≥10-chunk tiers, so
    * the cost is visible in the driver log (same no-silent-caps
    * discipline as the bench's warmup/adjudication reporting). At maxDist
    * 3 the 6-chunk tier's 3·10=30-bit key already covers n ≈ 2^24 (16M
    * multimodal docs); the upper tiers are for billion-scale corpora.
    */
  def autoChunks(n: Long, maxDist: Int = 3): Int = {
    val target = 6 +
      math.ceil(math.log(math.max(n, 2L).toDouble) / math.log(2.0)).toInt
    val chosen = Seq(4, 5, 6, 10, 12)
      .filter(c => c > maxDist && 60 % c == 0)
      .find(c => (c - maxDist) * (60 / c) >= target)
      .getOrElse(12)
    if (chosen >= 10) {
      val repl = (0 until chosen).combinations(chosen - maxDist).size
      System.err.println(
        s"[multimodal] autoChunks(n=$n, maxDist=$maxDist) selected the " +
          s"$chosen-chunk tier: ${repl}x block-row replication per doc " +
          s"(key width ${(chosen - maxDist) * (60 / chosen)} bits). This is " +
          "the documented large-corpus trade (linear with a big constant " +
          "vs a quadratic collision floor) - see Multimodal.autoChunks.")
    }
    chosen
  }

  /** [[phashPairsBlocked]] with the chunk count derived from the corpus
    * via [[autoChunks]] (one eager `count()` — persist expensive inputs
    * first). The scale-path entry point; the pinned 4-chunk
    * [[phashPairs]] stays the reproducible oracled default.
    */
  def phashPairsAuto(binTable: DataFrame, idCol: String,
                     maxDist: Int = 3): DataFrame =
    phashPairsBlocked(binTable, idCol, maxDist,
      autoChunks(binTable.count(), maxDist))

  /** The shared signature-rebuild CTE chain (`h → pos → by → bk → tot →
    * sg`): DuckDB recomputes every payload's 60-bit signature from the
    * hex dump with pure integer arithmetic.
    */
  private def phashSigCtes(table: String, idCol: String, textCol: String): String =
    s"""WITH h AS (
       |  SELECT $idCol AS id, hex(encode($textCol)) AS hx,
       |         octet_length(encode($textCol)) AS n
       |  FROM $table WHERE octet_length(encode($textCol)) > 0
       |), pos AS (
       |  SELECT id, n, hx, unnest(range(1, n + 1)) AS i FROM h
       |), by AS (
       |  SELECT id, n,
       |         (strpos('0123456789ABCDEF', substring(hx, CAST(2*i - 1 AS INTEGER), 1)) - 1) * 16 +
       |         (strpos('0123456789ABCDEF', substring(hx, CAST(2*i AS INTEGER), 1)) - 1) AS bv,
       |         CAST(((i - 1) * 60) // n AS BIGINT) AS k
       |  FROM pos
       |), bk AS (
       |  SELECT id, n, k, SUM(bv) AS sum_k, COUNT(*) AS cnt_k
       |  FROM by GROUP BY 1, 2, 3
       |), tot AS (
       |  SELECT id, SUM(bv) AS total FROM by GROUP BY 1
       |), sg AS (
       |  SELECT bk.id, SUM(CASE WHEN sum_k * n > total * cnt_k
       |                         THEN (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) ELSE 0 END) AS ph
       |  FROM bk JOIN tot ON bk.id = tot.id GROUP BY 1
       |)""".stripMargin

  /** DuckDB mirror of [[phashSignatures]] (over non-empty payloads) —
    * pins all 60 bits of every signature, so the PAIRS query's "no pairs
    * under hamming ≤ 3" answer is a checked statement about checked
    * signatures, not a vacuous empty-join match.
    */
  def phashSignaturesOracleSql(table: String, idCol: String, textCol: String): String =
    s"""${phashSigCtes(table, idCol, textCol)}
       |SELECT id AS $idCol, CAST(ph AS BIGINT) AS ph FROM sg""".stripMargin

  /** DuckDB mirror of [[phashPairs]] over the text-backed binary table:
    * byte values come from the hex dump (the [[toBinaryTable]] payload is
    * `encode(text)`), bucket/total sums are integer-exact, and the same
    * chunk block join + xor-bit_count hamming runs on the rebuilt sigs.
    */
  def phashPairsOracleSql(table: String, idCol: String, textCol: String,
                          maxDist: Int = 3): String =
    s"""${phashSigCtes(table, idCol, textCol)}
       |, ch AS (
       |  SELECT id, ph, i AS chunk_idx, (ph >> (i * 15)) & 32767 AS chunk
       |  FROM sg, (SELECT unnest([0, 1, 2, 3]) AS i)
       |)
       |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |       CAST(bit_count(xor(a.ph, b.ph)) AS INTEGER) AS hamming
       |FROM ch a JOIN ch b
       |  ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.id < b.id
       |WHERE bit_count(xor(a.ph, b.ph)) <= $maxDist""".stripMargin

  /** Video frame-sampling manifest: which frames to decode, decided
    * entirely from metadata — the planning step that runs BEFORE any
    * (expensive, library-bound) decode touches bytes. Frame count is
    * derived from payload size through a stub bytes-per-second rate (a
    * real container's duration metadata drops in without touching the
    * sampling); samples are every `stride`-th frame with a deterministic
    * per-doc hash phase (so corpus-wide sampling isn't aligned to frame
    * 0 — the usual anti-aliasing trick, but reproducible), capped at
    * `maxSamples` per doc. Pure integer arithmetic + sequence/explode:
    * zero shuffles, fan-out ≤ maxSamples per row.
    */
  def frameSampleManifest(docs: DataFrame, idCol: String, bytesCol: String,
                          fps: Int = 24, bytesPerSec: Int = 256,
                          stride: Int = 48, maxSamples: Int = 64,
                          salt: String = ":fs"): DataFrame = {
    require(fps > 0 && bytesPerSec > 0 && stride > 0 && maxSamples > 0,
      "frameSampleManifest params must be positive")
    // Column `/` is double division; exact integer floor-div for
    // non-negative longs via the pmod identity
    def floorDiv(x: org.apache.spark.sql.Column, m: Long) =
      ((x - pmod(x, lit(m))) / lit(m)).cast("long")
    val phase = pmod(
      graft.text.TextOps.md5Hash60(
        concat(col(idCol).cast("string"), lit(salt))),
      lit(stride.toLong))
    docs
      .select(col(idCol), col(bytesCol).cast("long").as("_bytes"))
      .withColumn("_nf", floorDiv(col("_bytes") * fps, bytesPerSec.toLong))
      .withColumn("_ph", phase)
      .filter(col("_nf") > col("_ph"))
      .withColumn("_ns",
        least(floorDiv(col("_nf") - col("_ph") - 1L, stride.toLong) + 1L,
          lit(maxSamples.toLong)))
      .select(col(idCol),
        explode(sequence(lit(0L), col("_ns") - 1L)).as("sample_no"),
        col("_ph"))
      .select(col(idCol), col("sample_no"),
        (col("_ph") + col("sample_no") * stride).as("frame_idx"))
      .withColumn("ts_ms", floorDiv(col("frame_idx") * 1000L, fps.toLong))
      .select(col(idCol), col("sample_no"), col("frame_idx"), col("ts_ms"))
  }

  /** DuckDB mirror of [[frameSampleManifest]] over the text-backed
    * table (`bytes = octet_length(encode(text))`).
    */
  def frameSampleOracleSql(table: String, idCol: String, textCol: String,
                           fps: Int = 24, bytesPerSec: Int = 256,
                           stride: Int = 48, maxSamples: Int = 64,
                           salt: String = ":fs"): String =
    s"""WITH b AS (
       |  SELECT $idCol,
       |         CAST(octet_length(encode($textCol)) AS BIGINT) AS bytes,
       |         CAST(concat('0x', substr(md5(concat(CAST($idCol AS VARCHAR), '$salt')), 1, 15)) AS BIGINT) % $stride AS ph
       |  FROM $table
       |), f AS (
       |  SELECT $idCol, ph, (bytes * $fps) // $bytesPerSec AS nf
       |  FROM b
       |), s AS (
       |  SELECT $idCol, ph,
       |         least((nf - ph - 1) // $stride + 1, $maxSamples) AS ns
       |  FROM f WHERE nf > ph
       |)
       |SELECT $idCol, CAST(j AS BIGINT) AS sample_no,
       |       CAST(ph + j * $stride AS BIGINT) AS frame_idx,
       |       CAST((ph + j * $stride) * 1000 // $fps AS BIGINT) AS ts_ms
       |FROM s, LATERAL unnest(range(0, ns)) AS t(j)""".stripMargin
}
