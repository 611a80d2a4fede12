package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
    ("b", 5L, 1.0), ("b", 6L, 2.0),
    ("c", 7L, 5.0)
  ).toDF("k", "id", "v")

  test("keeps exactly the top-k rows per key with deterministic tiebreak") {
    val out = TopKPerKey(df, Seq("k"), Seq(col("v").desc, col("id").asc), 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // a: v=30(id 2), v=30(id 4) — both 30s beat 20; b: both rows; c: one row
    assert(out == Set(("a", 2L), ("a", 4L), ("b", 5L), ("b", 6L), ("c", 7L)))
  }

  test("k=0 returns empty (like rn <= 0); negative k too") {
    assert(TopKPerKey(df, Seq("k"), Seq(col("v").desc), 0).count() == 0)
    assert(TopKPerKey(df, Seq("k"), Seq(col("v").desc), -3).count() == 0)
  }

  test("float keys: -0.0 and 0.0 group as ONE key (normalized like the window form)") {
    val zeros = Seq((0.0, 1L, 5.0), (-0.0, 2L, 4.0), (-0.0, 3L, 3.0), (1.5, 4L, 2.0))
      .toDF("fk", "id", "v")
    val out = TopKPerKey(zeros, Seq("fk"), Seq(col("v").desc, col("id").asc), 2)
      .collect().map(_.getLong(1)).toSet
    // 0.0 and -0.0 are one group: top-2 by v = ids 1,2; plus the 1.5 group
    assert(out == Set(1L, 2L, 4L), s"got $out")
  }

  test("key names resolve case-insensitively (like groupBy)") {
    val out = TopKPerKey(df, Seq("K"), Seq(col("v").desc, col("id").asc), 1)
      .collect().map(_.getLong(1)).toSet
    assert(out == Set(2L, 6L, 7L))
  }

  test("matches the window row_number formulation on real data") {
    val orders = graft.core.Tables.orders(spark, sfDir)
    val viaOp = TopKPerKey(orders, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaOp == viaWindow)
  }

  test("plans one exchange with a map-side partial top-k below it") {
    val out = TopKPerKey(df, Seq("k"), Seq(col("v").desc, col("id").asc), 2)
    val tree = out.queryExecution.executedPlan.toString
    assert(tree.contains("TopKPerKey"), tree)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(tree).size
    assert(shuffles == 1, s"expected exactly 1 exchange:\n$tree")
    // partial stage (flag `true`) appears BELOW the exchange, final above
    val lines = tree.linesIterator.toSeq
    val exIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(lines.take(exIdx).exists(l => l.contains("TopKPerKey") && l.endsWith("false")), tree)
    assert(lines.drop(exIdx).exists(l => l.contains("TopKPerKey") && l.endsWith("true")), tree)
  }
}
