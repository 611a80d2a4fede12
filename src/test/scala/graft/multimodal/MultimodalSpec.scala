package graft.multimodal

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world"),
    (2L, ""),
    (3L, "aaaa")
  ).toDF("doc_id", "text")

  test("toBinaryTable carries payload bytes + typed metadata") {
    val bt = Multimodal.toBinaryTable(docs, "doc_id", "text", "text/plain")
    val r = bt.filter(col("doc_id") === 1L).select("meta.n_bytes", "meta.modality").collect()(0)
    assert(r.getInt(0) == 11 && r.getString(1) == "text/plain")
    val payload = bt.filter(col("doc_id") === 1L).select("payload").collect()(0).getAs[Array[Byte]](0)
    assert(new String(payload, "UTF-8") == "hello world")
  }

  test("decodeFeatures: per-partition stub decode emits normalized histograms") {
    val bt = Multimodal.toBinaryTable(docs, "doc_id", "text", "text/plain")
    val feats = Multimodal.decodeFeatures(bt, "doc_id", dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L).length == 16)
    assert(math.abs(feats(1L).sum - 1.0f) < 1e-5) // normalized histogram
    assert(feats(2L).sum == 0.0f)                 // empty payload -> zero vector
    // 'aaaa' -> all mass on bucket 'a'(97) % 16 = 1
    assert(feats(3L)(1) == 1.0f)
  }

  test("sampleChunks emits every k-th fixed-size byte chunk") {
    val long = Seq((9L, "x" * 300)).toDF("doc_id", "text")
    val bt = Multimodal.toBinaryTable(long, "doc_id", "text", "text/plain")
    val chunks = Multimodal.sampleChunks(bt, "doc_id", chunkBytes = 64, everyK = 2).collect()
    // 300 bytes -> 5 chunks (64,64,64,64,44); every 2nd -> idx 0,2,4
    assert(chunks.map(_.getAs[Int]("chunk_idx")).sorted.toSeq == Seq(0, 2, 4))
    assert(chunks.find(_.getAs[Int]("chunk_idx") == 4).get.getAs[Int]("chunk_bytes") == 44)
  }

  test("sampleChunks: empty payload yields zero rows, not a phantom chunk") {
    val bt = Multimodal.toBinaryTable(docs, "doc_id", "text", "text/plain")
    val empty = Multimodal.sampleChunks(bt.filter(col("doc_id") === 2L), "doc_id")
    assert(empty.count() == 0)
  }

  test("decodeFeatures carries a non-long id column through verbatim") {
    val sdocs = Seq(("d1", "abc"), ("d2", "xyz")).toDF("doc_id", "text")
    val bt = Multimodal.toBinaryTable(sdocs, "doc_id", "text", "text/plain")
    val out = Multimodal.decodeFeatures(bt, "doc_id", dim = 4)
    assert(out.schema("doc_id").dataType == org.apache.spark.sql.types.StringType)
    assert(out.collect().map(_.getString(0)).toSet == Set("d1", "d2"))
  }

  test("phash: identical payloads collide, disjoint energy profiles differ") {
    val sdocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog, twice over"),
      (2L, "the quick brown fox jumps over the lazy dog, twice over"), // exact dup
      (3L, "zzzzzzzzzzzzzzzzzzzzzzzz                          !!!!!!") // front-loaded energy
    ).toDF("doc_id", "text")
    val bt = Multimodal.toBinaryTable(sdocs, "doc_id", "text", "text/plain")
    val sigs = Multimodal.phashSignatures(bt, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    val pairs = Multimodal.phashPairs(bt, "doc_id").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      == Seq((1L, 2L, 0)))
  }

  test("phash: empty payloads never pair; signature uses only 60 bits") {
    val sdocs = Seq((1L, ""), (2L, ""), (3L, "content here")).toDF("doc_id", "text")
    val bt = Multimodal.toBinaryTable(sdocs, "doc_id", "text", "text/plain")
    assert(Multimodal.phashPairs(bt, "doc_id").count() == 0)
    val sig = Multimodal.phashSignatures(bt.filter(col("doc_id") === 3L), "doc_id")
      .collect().head.getLong(1)
    assert((sig >>> 60) == 0L, "bits above 60 must be clear")
  }

  test("frameSampleManifest: strided frames with per-doc phase, capped, in range") {
    // doc 1: 25600 bytes → 25600*24/256 = 2400 frames; doc 2 tiny → few/none
    val docs = Seq((1L, 25600L), (2L, 16L)).toDF("doc_id", "n_bytes")
    val out = Multimodal.frameSampleManifest(docs, "doc_id", "n_bytes",
        fps = 24, bytesPerSec = 256, stride = 48, maxSamples = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.nonEmpty && d1.length <= 64)
    val phase = d1.head._3
    assert(phase >= 0 && phase < 48)
    // strictly strided from the phase; every frame inside [0, nFrames)
    assert(d1.zipWithIndex.forall { case ((_, no, fi, _), i) =>
      no == i && fi == phase + i * 48 && fi < 2400 })
    // ts_ms = frame_idx * 1000 / fps (integer)
    assert(d1.forall { case (_, _, fi, ts) => ts == fi * 1000 / 24 })
  }

  test("frameSampleManifest: zero shuffles (metadata-only planning)") {
    val docs = Seq((1L, 25600L)).toDF("doc_id", "n_bytes")
    val plan = Multimodal.frameSampleManifest(docs, "doc_id", "n_bytes")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
