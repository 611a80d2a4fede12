package graft.ops

import graft.SparkSpecBase

class SnapshotDiffSpec extends SparkSpecBase {
  import spark.implicits._

  test("classifies added, removed, changed; drops unchanged") {
    val before = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("k", "v")
    val after = Seq((1, "a"), (2, "B"), (4, "d"), (5, "e")).toDF("k", "v")
    val out = SnapshotDiff.diff(before, after, Seq("k"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out == Map(2 -> "changed", 3 -> "removed", 5 -> "added"))
  }

  test("null, empty string, and the string 'null' are distinct values") {
    val before = Seq((1, Option.empty[String]), (2, Some("")), (3, Some("null")))
      .toDF("k", "v")
    // rotate the three representations: every key must read as changed
    val after = Seq((1, Some("")), (2, Some("null")), (3, Option.empty[String]))
      .toDF("k", "v")
    val out = SnapshotDiff.diff(before, after, Seq("k")).collect()
    assert(out.length == 3 && out.forall(_.getString(1) == "changed"))
  }

  test("multi-column payload: any column difference flags the row") {
    val before = Seq((1, "a", 10), (2, "b", 20)).toDF("k", "v", "w")
    val after = Seq((1, "a", 11), (2, "b", 20)).toDF("k", "v", "w")
    val out = SnapshotDiff.diff(before, after, Seq("k"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out == Map(1 -> "changed"))
  }

  test("identical snapshots diff to empty") {
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    assert(SnapshotDiff.diff(df, df, Seq("k")).count() == 0L)
  }

  test("schema mismatch and payload-free inputs are rejected") {
    val a = Seq((1, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(a, Seq((1, "a")).toDF("k", "w"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(a.select("k"), a.select("k"), Seq("k"))
    }
  }
}
