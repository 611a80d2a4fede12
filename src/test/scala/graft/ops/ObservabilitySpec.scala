package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ObservabilitySpec extends SparkSpecBase {
  import spark.implicits._

  test("observed quality metrics ride the consuming job (no second scan)") {
    val df = Seq(
      (1L, Some("a")), (2L, None), (3L, Some("c")), (4L, None), (5L, None)
    ).toDF("id", "v")
    val (observed, obs) = Observability.observeQuality(df, Seq("v"))
    // the consuming action is an unrelated aggregate — metrics piggyback
    val total = observed.agg(sum("id")).collect()(0).getLong(0)
    assert(total == 15L)
    val m = obs.get
    assert(m("n_rows") == 5L)
    assert(m("n_null_v") == 3L)
  }

  test("observe then ML scoring in the same session works (summary-free closures)") {
    import org.apache.spark.ml.linalg.Vectors
    // using an Observation initializes the session's non-serializable
    // ObservationManager; model scoring must not drag the session into
    // task closures afterwards (TrainHarness scores with summary-free
    // model copies) — this pins the interaction
    val (observed, obs) = Observability.observeQuality(
      Seq((1L, "x")).toDF("id", "v"), Seq("v"))
    observed.count()
    assert(obs.get("n_rows") == 1L)
    val train = (
      (1 to 20).map(i => (i.toLong, Vectors.dense(i * 0.1), 0.0)) ++
        (21 to 40).map(i => (i.toLong, Vectors.dense(2.0 + i * 0.1), 1.0))
    ).toDF("id", "features", "label")
    val scored = graft.ml.TrainHarness.logisticL1Scores(train, train, "features", "label")
    assert(scored.count() == 40)
  }

  test("observation composes under pushed-down filters") {
    val df = graft.core.Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 100000.0)
    val (observed, obs) = Observability.observeQuality(df, Seq("o_orderdate"))
    val n = observed.count()
    assert(obs.get("n_rows") == n)
    assert(obs.get("n_null_o_orderdate") == 0L)
  }
}
