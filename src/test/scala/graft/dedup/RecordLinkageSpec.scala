package graft.dedup

import graft.SparkSpecBase
import graft.dedup.RecordLinkage.FieldRule
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val a = Seq(
    (1L, "blk1", "alice", 100.0),
    (2L, "blk1", "bob", 200.0),
    (3L, "blk2", "carol", 300.0)
  ).toDF("id", "blk", "name", "bal")

  private lazy val b = Seq(
    (1L, "blk1", "alice", 100.0),   // exact twin
    (2L, "blk1", "bobby", 200.0),   // name perturbed
    (3L, "blk2", "carol", 310.0)    // balance perturbed
  ).toDF("id", "blk", "name", "bal")

  private val rules = Seq(
    FieldRule("name", (x, y) => x === y, 3L, 1L),
    FieldRule("bal", (x, y) => abs(x - y) <= 0.005, 2L, 2L))

  test("scores sum agreement/disagreement weights per field") {
    val got = RecordLinkage.scorePairs(a, b, "id", Seq("blk"), rules)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 1L)) == 5L)   // both agree: +3 +2
    assert(got((2L, 2L)) == 1L)   // name off: -1 +2
    assert(got((3L, 3L)) == 1L)   // bal off: +3 -2
    assert(got((1L, 2L)) == -3L)  // cross pair in blk1: -1 -2
  }

  test("blocking bounds candidates: no cross-block pairs") {
    val pairs = RecordLinkage.scorePairs(a, b, "id", Seq("blk"), rules)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // blk1 has 2×2 pairs, blk2 has 1×1 — never 3×3 = 9
    assert(pairs.size == 5)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((3L, 1L)))
  }

  test("scoreDistribution separates true twins from cross pairs") {
    val dist = RecordLinkage.scoreDistribution(
        RecordLinkage.scorePairs(a, b, "id", Seq("blk"), rules))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(dist(5L) == (1L, 1L))  // the exact twin
    assert(dist(1L) == (2L, 2L))  // the two single-field perturbed twins
    assert(dist(-3L) == (2L, 0L)) // cross pairs are never "true"
  }

  test("blocked join plans as an equi-join, not a cartesian") {
    val plan = RecordLinkage.scorePairs(a, b, "id", Seq("blk"), rules)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan)
  }
}
