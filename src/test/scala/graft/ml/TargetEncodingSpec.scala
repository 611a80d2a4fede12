package graft.ml

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TargetEncodingSpec extends SparkSpecBase {
  import spark.implicits._

  // 10 rows: cat a → 4 rows 3 pos; cat b → 5 rows 1 pos; cat c → 1 row 0 pos
  private def df = Seq(
    ("a", 1), ("a", 1), ("a", 1), ("a", 0),
    ("b", 1), ("b", 0), ("b", 0), ("b", 0), ("b", 0),
    ("c", 0)
  ).toDF("cat", "y")

  test("encode interpolates between category rate and prior by alpha") {
    val enc = TargetEncoding.encode(df, "cat", col("y") === 1, alpha = 2.0)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("encoding")).toMap
    val prior = 4.0 / 10.0
    assert(math.abs(enc("a") - (3 + 2 * prior) / (4 + 2)) < 1e-12)
    assert(math.abs(enc("b") - (1 + 2 * prior) / (5 + 2)) < 1e-12)
    // singleton category: dominated by the prior, not its own 0/1 label
    assert(math.abs(enc("c") - (0 + 2 * prior) / (1 + 2)) < 1e-12)
  }

  test("alpha → ∞ collapses every encoding toward the prior") {
    val enc = TargetEncoding.encode(df, "cat", col("y") === 1, alpha = 1e9)
      .collect().map(_.getAs[Double]("encoding"))
    enc.foreach(e => assert(math.abs(e - 0.4) < 1e-6))
  }

  test("leave-one-out excludes the row's own label") {
    val keyed = df.withColumn("id", monotonically_increasing_id())
    val loo = TargetEncoding.looEncode(keyed, "cat", col("y") === 1, alpha = 2.0)
      .select("cat", "y", "loo_encoding")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getAs[Double]("loo_encoding")).toMap
    val prior = 0.4
    // a positive row of cat a sees (3-1) positives over (4-1) peers
    assert(math.abs(loo(("a", 1)) - (3 - 1 + 2 * prior) / (4 - 1 + 2)) < 1e-12)
    assert(math.abs(loo(("a", 0)) - (3 - 0 + 2 * prior) / (4 - 1 + 2)) < 1e-12)
    // the singleton category's only row sees pure prior smoothing
    assert(math.abs(loo(("c", 0)) - (2 * prior) / 2) < 1e-12)
  }
}
