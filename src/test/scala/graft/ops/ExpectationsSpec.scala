package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpecBase {
  import spark.implicits._

  test("check evaluates all rules in one pass with exact violation counts") {
    val df = Seq(
      (1, Some(10.0)), (2, Some(-5.0)), (3, None), (4, Some(200.0)), (5, Some(30.0))
    ).toDF("id", "v")
    val out = Expectations.check(df, Seq(
        "v_in_range" -> !(col("v") >= 0 && col("v") <= 100),
        "v_not_null" -> col("v").isNull))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // null v is NOT a range violation (predicate → null → else); it is a
    // not-null violation
    assert(out("v_in_range") == (2L, 5L))  // -5 and 200
    assert(out("v_not_null") == (1L, 5L))
  }

  test("checkUnique counts rows beyond the first per duplicate key") {
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "a"), (2, "a"))
      .toDF("k1", "k2")
    val r = Expectations.checkUnique(df, Seq("k1", "k2"), "uniq").collect().head
    // groups: (1,a)×2, (1,b)×1, (2,a)×3 → 6 rows, 3 distinct → 3 extra
    assert(r.getString(0) == "uniq" && r.getLong(1) == 3L && r.getLong(2) == 6L)
  }

  test("checkFk counts orphans without multiplying duplicate parent keys") {
    val child = Seq(1, 1, 2, 3, 9, 9).toDF("ck")
    val parent = Seq(1, 1, 2, 3, 4).toDF("pk") // duplicate parent key 1
    val r = Expectations.checkFk(child, "ck", parent, "pk", "fk").collect().head
    // orphans: the two ck=9 rows; total stays 6 despite parent dup
    assert(r.getString(0) == "fk" && r.getLong(1) == 2L && r.getLong(2) == 6L)
  }

  test("clean data passes every expectation") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val out = Expectations.check(li, Seq(
        "quantity_range" -> !(col("l_quantity") >= 1 && col("l_quantity") <= 50),
        "shipdate_not_null" -> col("l_shipdate").isNull))
      .collect()
    assert(out.forall(_.getLong(1) == 0L))
  }
}
