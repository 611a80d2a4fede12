package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Stage semantics of the composed curation funnel — especially the
  * stages the synthetic corpus never triggers (exact_dup) and the
  * first-failure charging order between stages.
  */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  // text long/clean enough to pass the quality rules used below
  private val good =
    "the quick brown fox jumps over the lazy dog and runs far away today " +
      "with many other small animals under bright warm summer skies"
  private val goodB =
    "some other wholly different body of prose about ships and harbors " +
      "that sails the wide open sea with the wind and the stars above"

  private def funnel(docs: Seq[(Long, String)], probes: Seq[(Long, String)]) =
    Curation.funnel(
      docs.toDF("doc_id", "text"), probes.toDF("doc_id", "text"),
      "doc_id", "text",
      minTokens = 5, maxTokens = 100000,
      minMeanLen = 1.0, maxMeanLen = 100.0, minTtr = 0.1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("exact_dup: identical normalized content keeps the EARLIEST doc only") {
    val st = funnel(Seq(
      1L -> good,
      2L -> (good.toUpperCase + "!!!"), // same token stream after normalize
      3L -> goodB
    ), probes = Seq.empty)
    assert(st(1L) === "kept")
    assert(st(2L) === "exact_dup")
    assert(st(3L) === "kept")
  }

  test("first-failure charging: a dup of a QUALITY-dropped doc is not near_dup") {
    // doc 10 fails n_tokens (too short); doc 11 is its exact duplicate but
    // doc 11 passes nothing earlier — with 10 dropped at quality, 11 is
    // the EARLIEST surviving copy, so it must be kept, not charged
    // exact_dup/near_dup against a ghost
    val shortTxt = "the tiny text"
    val st = funnel(Seq(
      10L -> shortTxt,
      11L -> good,
      12L -> good
    ), probes = Seq.empty)
    assert(st(10L) === "n_tokens")
    assert(st(11L) === "kept")
    assert(st(12L) === "exact_dup")
  }

  test("contamination only charges SURVIVORS of the dedup stages") {
    // doc 21 is an exact dup AND shares shingles with the probe — it must
    // be charged exact_dup (the earlier stage), never contaminated
    val st = funnel(Seq(
      20L -> good,
      21L -> good,
      22L -> goodB
    ), probes = Seq(900L -> goodB))
    assert(st(21L) === "exact_dup")
    assert(st(22L) === "contaminated")
    assert(st(20L) === "kept")
  }

  test("lang gate fires before quality: no marker words and no CJK → lang_id") {
    // tokens carry no marker words at all
    val noLang = "zzz qqq kkk www vvv mmm nnn ppp rrr sss ttt uuu"
    val st = funnel(Seq(30L -> noLang, 31L -> good), probes = Seq.empty)
    assert(st(30L) === "lang_id")
    assert(st(31L) === "kept")
  }

  test("funnel labels every corpus doc exactly once") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = Curation.funnel(
      docs.filter(col("doc_id") % 100 =!= 0),
      docs.filter(col("doc_id") % 100 === 0),
      "doc_id", "text",
      minTokens = 15, maxTokens = 100000,
      minMeanLen = 3.2, maxMeanLen = 4.65, minTtr = 0.32)
    val nCorpus = docs.filter(col("doc_id") % 100 =!= 0).count()
    assert(out.count() === nCorpus)
    assert(out.select("doc_id").distinct().count() === nCorpus)
    val stages = out.select("stage").distinct().as[String].collect().toSet
    val allowed = Set("lang_id", "n_tokens", "mean_token_len",
      "type_token_ratio", "exact_dup", "near_dup", "contaminated", "kept")
    assert(stages.subsetOf(allowed))
  }
}
