package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted aggregation equals the plain aggregation exactly (skewed key)") {
    // heavily skewed: 'hot' holds 90% of rows
    val df = (Seq.fill(900)("hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i.toDouble) }.toDF("k", "v")
    val salted = SkewOps.saltedAgg(df, "k", col("v"), saltBuckets = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted.keySet == plain.keySet)
    assert(salted("hot")._1 == 900L)
    plain.foreach { case (k, (n, s)) =>
      assert(salted(k)._1 == n, s"count mismatch for $k")
      assert(math.abs(salted(k)._2 - s) < 1e-6, s"sum mismatch for $k")
    }
  }

  test("saltedCount spreads a hot key over multiple pre-aggregation groups") {
    val df = Seq.fill(1000)("hot").toDF("k")
    val out = SkewOps.saltedCount(df, "k", saltBuckets = 4).collect()
    assert(out.length == 1 && out(0).getLong(1) == 1000L)
  }
}
