package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class JoinMaintenanceSpec extends SparkSpecBase {
  import spark.implicits._

  // facts: (order id used only for delta selection, cust key, price)
  private val baseA = Seq(
    (1L, 10L, 100.0), (2L, 10L, 50.0), (3L, 20L, 75.0), (4L, 30L, 25.0)
  ).toDF("ok", "ck", "price")
  // dims: (cust key, nation)
  private val baseB = Seq(
    (10L, "N1"), (20L, "N1"), (30L, "N2")
  ).toDF("ck", "nation")

  private def recompute(a: org.apache.spark.sql.DataFrame,
                        b: org.apache.spark.sql.DataFrame) =
    JoinMaintenance.snapshot(a, b, "ck", "ck", "nation", "price")
      .collect().map(r => r.getAs[String]("nation") ->
        (r.getAs[Long]("cnt"), r.getAs[java.math.BigDecimal]("sum_v").doubleValue()))
      .toMap

  private def maintained(deltaA: org.apache.spark.sql.DataFrame,
                         deltaB: org.apache.spark.sql.DataFrame) = {
    val snap = JoinMaintenance.snapshot(baseA, baseB, "ck", "ck", "nation", "price")
    JoinMaintenance.maintain(snap, baseA, deltaA, baseB, deltaB,
      "ck", "ck", "nation", "price")
      .collect().map(r => r.getAs[String]("nation") ->
        (r.getAs[Long]("cnt"), r.getAs[java.math.BigDecimal]("sum_v").doubleValue()))
      .toMap
  }

  test("both-side deltas including the cross term match the recompute") {
    // delete order 1 (cust 10), insert order 5 for cust 20,
    // AND delete customer 10 entirely — order 2 leaves via A⋈ΔB, the
    // already-deleted order 1 must NOT double-leave (ΔA⋈ΔB corrects +1)
    val deltaA = Seq((1L, 10L, 100.0, -1L), (5L, 20L, 60.0, 1L))
      .toDF("ok", "ck", "price", "sign")
    val deltaB = Seq((10L, "N1", -1L)).toDF("ck", "nation", "sign")
    val newA = baseA.filter(col("ok") =!= 1L)
      .union(Seq((5L, 20L, 60.0)).toDF("ok", "ck", "price"))
    val newB = baseB.filter(col("ck") =!= 10L)
    assert(maintained(deltaA, deltaB) == recompute(newA, newB))
  }

  test("a group whose count reaches zero disappears") {
    val deltaA = Seq((4L, 30L, 25.0, -1L)).toDF("ok", "ck", "price", "sign")
    val deltaB = Seq.empty[(Long, String, Long)].toDF("ck", "nation", "sign")
    val out = maintained(deltaA, deltaB)
    assert(!out.contains("N2"))
    assert(out.contains("N1"))
  }

  test("empty deltas reproduce the snapshot exactly") {
    val emptyA = Seq.empty[(Long, Long, Double, Long)].toDF("ok", "ck", "price", "sign")
    val emptyB = Seq.empty[(Long, String, Long)].toDF("ck", "nation", "sign")
    assert(maintained(emptyA, emptyB) == recompute(baseA, baseB))
  }
}
