package graft.sketch

import graft.SparkSpecBase
import graft.core.Tables
import graft.text.TextOps
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpecBase {

  test("cms: estimate >= exact for every item (one-sided error)") {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(TextOps.tokens(col("text"))).as("item"))
    val cms = Sketches.cmsBuild(toks, "item")
    val exact = toks.groupBy("item").agg(count(lit(1)).as("exact_cnt"))
    val rows = Sketches.cmsEstimate(cms, exact, "item")
      .join(exact, Seq("item")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("cms_est"); val ex = r.getAs[Long]("exact_cnt")
      assert(est >= ex, s"${r.getAs[String]("item")}: est $est < exact $ex")
    }
  }

  test("cms: sketch is cardinality-bounded at depth x width") {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(TextOps.tokens(col("text"))).as("item"))
    val cms = Sketches.cmsBuild(toks, "item", depth = 4, width = 256L)
    assert(cms.count() <= 4L * 256L)
    // each row's total equals the full stream length (every item counted
    // once per hash row)
    val n = toks.count()
    val perRow = cms.groupBy("j").agg(sum("cnt").as("s")).collect()
    assert(perRow.length == 4)
    perRow.foreach(r => assert(r.getAs[Long]("s") == n))
  }

  test("cmsMerge of disjoint shards equals the whole-stream sketch (linearity)") {
    val docs = Tables.documents(spark, sfDir)
    def toks(f: org.apache.spark.sql.Column) = docs.filter(f)
      .select(explode(TextOps.tokens(col("text"))).as("item"))
    val full = Sketches.cmsBuild(toks(lit(true)), "item")
    val merged = Sketches.cmsMerge(
      Sketches.cmsBuild(toks(col("doc_id") % 2 === 0), "item"),
      Sketches.cmsBuild(toks(col("doc_id") % 2 === 1), "item"))
    val diff = full.withColumnRenamed("cnt", "a")
      .join(merged.withColumnRenamed("cnt", "b"), Seq("j", "bucket"), "full_outer")
      .filter(coalesce(col("a"), lit(-1L)) =!= coalesce(col("b"), lit(-1L)))
    assert(diff.count() == 0)
  }

  test("kmv: estimate within 25% of exact at k=64") {
    val r = Sketches.kmvDistinct(Tables.orders(spark, sfDir), "o_custkey").head()
    val exact = r.getAs[Long]("exact_distinct").toDouble
    val est = r.getAs[Double]("kmv_est")
    assert(exact > 0)
    assert(math.abs(est - exact) / exact < 0.25, s"est $est vs exact $exact")
  }

  test("kmv: fewer distinct keys than k -> estimate still finite and sane") {
    val r = Sketches.kmvDistinct(Tables.region(spark, sfDir), "r_regionkey", k = 64).head()
    // with <k distinct keys the kth hash is the max hash; estimate is a
    // (biased) upper-ballpark but must not blow up or divide by zero
    assert(r.getAs[Long]("exact_distinct") == 5L)
    assert(!r.getAs[Double]("kmv_est").isNaN)
    assert(r.getAs[Double]("kmv_est") > 0.0)
  }

  test("bloom: zero false negatives; false positives bounded") {
    val r = Sketches.bloomMembership(
      Tables.supplier(spark, sfDir), "s_suppkey",
      Tables.customer(spark, sfDir), "c_custkey").head()
    val nProbes = r.getAs[Long]("n_probes")
    val nTrue = r.getAs[Long]("n_true_members")
    val hits = r.getAs[Long]("n_bloom_hits")
    val fp = r.getAs[Long]("n_false_pos")
    assert(nProbes > 0 && nTrue > 0)
    assert(hits >= nTrue, "bloom may never miss a member")
    assert(fp == hits - nTrue)
    // m=4096 bits, k=3, few-hundred members: fp rate should stay modest
    assert(fp.toDouble / nProbes < 0.5, s"fp=$fp of $nProbes")
  }

  test("bloom: bit relation never exceeds the bit-space size") {
    val sup = Tables.supplier(spark, sfDir)
    // the distinct set-bit positions are what broadcasts — cardinality
    // must be bounded by `bits` regardless of member count
    val bits = sup.select(col("s_suppkey").cast("string").as("mk"))
      .select(col("mk"), explode(sequence(lit(0), lit(2))).as("j"))
      .select(pmod(TextOps.md5Hash60(concat(col("mk"), lit(":bf"), col("j").cast("string"))), lit(4096L)).as("pos"))
      .distinct().count()
    assert(bits <= 4096L)
  }

  test("kmvMerge: per-shard truncation loses nothing, for any shard count") {
    import spark.implicits._
    val keys = (1L to 500L).toDF("k")
    for (shards <- Seq(1, 4, 16)) {
      val r = Sketches.kmvMerge(keys, "k", k = 32, shards = shards)
        .collect().head
      assert(r.getAs[Long]("n_mismatch") == 0L,
        s"merged kth != full kth at shards=$shards")
      assert(r.getAs[Long]("kth_hash_full") == r.getAs[Long]("kth_hash_merged"))
    }
  }

  test("kmvIntersect: identical sets -> full overlap, estimate near truth") {
    import spark.implicits._
    val a = (1 to 500).map(i => s"u$i").toDF("k")
    val r = Sketches.kmvIntersect(a, "k", a, "k", k = 64).collect().head
    assert(r.getAs[Long]("exact_intersect") == 500L)
    // A = B means the union sketch IS both side sketches: every hash overlaps
    assert(r.getAs[Long]("overlap_k") == 64L)
    val est = r.getAs[Double]("kmv_intersect_est")
    assert(math.abs(est - 500.0) / 500.0 < 0.3, s"est $est vs 500")
  }

  test("kmvIntersect: disjoint sets -> zero overlap, estimate exactly 0") {
    import spark.implicits._
    val a = (1 to 400).map(i => s"u$i").toDF("k")
    val b = (401 to 800).map(i => s"u$i").toDF("k")
    val r = Sketches.kmvIntersect(a, "k", b, "k", k = 64).collect().head
    assert(r.getAs[Long]("exact_intersect") == 0L)
    assert(r.getAs[Long]("overlap_k") == 0L)
    assert(r.getAs[Double]("kmv_intersect_est") == 0.0)
  }

  test("kmvIntersect: half overlap estimates within sketch error") {
    import spark.implicits._
    val a = (1 to 600).map(i => s"u$i").toDF("k")      // 1..600
    val b = (301 to 900).map(i => s"u$i").toDF("k")    // 301..900, overlap 300
    val r = Sketches.kmvIntersect(a, "k", b, "k", k = 64).collect().head
    assert(r.getAs[Long]("exact_intersect") == 300L)
    val est = r.getAs[Double]("kmv_intersect_est")
    // ρ and D̂ are both k=64 estimates; allow a generous combined band
    assert(est > 100.0 && est < 600.0, s"est $est vs 300")
  }

  test("histQuantiles: uniform data → estimate within one cell width of exact") {
    import spark.implicits._
    val df = (1 to 10000).map(_.toDouble).toDF("v")
    val out = Sketches.histQuantiles(df, "v", buckets = 100, psPermille = Seq(500, 900, 990))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val cellWidth = (10000.0 - 1.0) / 100
    for ((p, (est, exact)) <- out) {
      assert(math.abs(exact - math.ceil(p / 1000.0 * 10000)) < 1e-9, s"p=$p exact=$exact")
      assert(math.abs(est - exact) <= cellWidth, s"p=$p est=$est exact=$exact")
    }
  }

  test("histQuantiles: constant column degenerates to the single value") {
    import spark.implicits._
    val df = Seq.fill(50)(7.5).toDF("v")
    val out = Sketches.histQuantiles(df, "v", buckets = 16, psPermille = Seq(500))
      .collect().head
    assert(out.getDouble(2) == 7.5)          // exact
    assert(math.abs(out.getDouble(1) - 7.5) < 1e-6, out.toString) // est: zero-width grid
  }

  test("histMergeCheck: shard histograms sum to the whole-stream build") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i.toLong, (i * 37 % 1000).toDouble)).toDF("id", "v")
    val r = Sketches.histMergeCheck(df, "v",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("id"), org.apache.spark.sql.functions.lit(7L)),
      buckets = 64).collect().head
    assert(r.getAs[Long]("n_mismatch") == 0L)
    assert(r.getAs[Long]("n_cells") <= 64L && r.getAs[Long]("n_cells") > 0L)
  }
}
