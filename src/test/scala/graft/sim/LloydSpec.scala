package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class LloydSpec extends SparkSpecBase {
  import spark.implicits._

  // two tight clusters far apart: Lloyd must separate them by round 1
  private lazy val emb = (
    (0L to 9L).map(i => (i, Array.fill(4)(0.001f * i))) ++          // near origin
    (10L to 19L).map(i => (i, Array.fill(4)(10.0f + 0.001f * i)))   // near 10
  ).toDF("vec_id", "embedding")

  test("well-separated clusters resolve to their true memberships") {
    val out = Lloyd.fitStats(emb, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(0 -> 10L, 1 -> 10L))
  }

  test("inertia decreases (weakly) across rounds") {
    def inertia(iters: Int): Long =
      Lloyd.fitStats(emb, "vec_id", "embedding", k = 2, iters = iters)
        .agg(sum("inertia_micro2")).collect()(0).getLong(0)
    val i1 = inertia(1)
    val i3 = inertia(3)
    assert(i3 <= i1, s"inertia rose: $i1 -> $i3")
  }

  test("deterministic across runs and partitionings") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Lloyd.fitStats(df, "vec_id", "embedding", k = 2, iters = 2)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(run(emb) == run(emb.repartition(7)))
  }

  test("k = 1 degenerates to one cluster holding everything") {
    val out = Lloyd.fitStats(emb, "vec_id", "embedding", k = 1, iters = 2)
      .collect()
    assert(out.length == 1 && out(0).getLong(1) == 20L)
  }

  test("fitCentroids exports the coarse-quantizer table sim_ivf_topk " +
    "broadcasts (r13): one (cluster_id, cvec) row per surviving cluster, " +
    "micro-scale means equal to the exact member averages") {
    val cents = Lloyd.fitCentroids(emb, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getInt(0) ->
        r.getSeq[Double](1).toArray).toMap
    assert(cents.keySet == Set(0, 1), s"expected clusters {0,1}, got ${cents.keySet}")
    assert(cents.values.forall(_.length == 4))
    // the well-separated fixture's true means, in integer-micro scale
    // (quantize = round(x*1e6)): cluster of i in 0..9 has mean micro
    // sum(round(1000*i))/10 = 4500; cluster of 10..19 has
    // sum(round(1e7 + 1000*i))/10 = 10,014,500 per dimension
    val near = cents.minBy(_._2.head)._2
    val far = cents.maxBy(_._2.head)._2
    assert(near.forall(_ == 4500.0), s"near-origin centroid ${near.toSeq}")
    assert(far.forall(_ == 10014500.0), s"far centroid ${far.toSeq}")
  }
}
