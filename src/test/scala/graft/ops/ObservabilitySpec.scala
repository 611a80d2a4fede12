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

  test("observation composes under pushed-down filters") {
    val df = graft.core.Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 100000.0)
    val (observed, obs) = Observability.observeQuality(df, Seq("o_orderdate"))
    val n = observed.count()
    assert(obs.get("n_rows") == n)
    assert(obs.get("n_null_o_orderdate") == 0L)
  }
}
