package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MergeOpsSpec extends SparkSpecBase {
  import spark.implicits._

  // key 1: O → O (no change, collapses) → F
  // key 2: single version
  // key 3: O → F → F (trailing no-change collapses)
  private def snaps = Seq(
    (1L, 10, "O"), (1L, 20, "O"), (1L, 30, "F"),
    (2L, 10, "O"),
    (3L, 10, "O"), (3L, 20, "F"), (3L, 30, "F")
  ).toDF("k", "ts", "status")

  test("scd2 collapses no-change versions and builds contiguous intervals") {
    val out = MergeOps.scd2(snaps, "k", "ts", Seq("status"))
      .select("k", "ts", "status", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Int]), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, 10, "O", Some(30), false), // ts=20 duplicate collapsed; interval runs to 30
      (1L, 30, "F", None, true),
      (2L, 10, "O", None, true),
      (3L, 10, "O", Some(20), false),
      (3L, 20, "F", None, true)       // ts=30 duplicate collapsed
    ))
  }

  test("exactly one current version per key; intervals chain without gaps") {
    val out = MergeOps.scd2(snaps, "k", "ts", Seq("status"))
    val perKey = out.groupBy("k")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_current"))
      .collect()
    assert(perKey.forall(_.getAs[Long]("n_current") == 1L))
    // each non-current version's valid_to equals the next version's valid_from
    val chained = out
      .withColumn("next_from",
        lead("valid_from", 1).over(
          org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("valid_from")))
      .filter(!col("is_current"))
      .filter(col("valid_to") =!= col("next_from"))
    assert(chained.count() == 0)
  }

  test("scd2 handles null attribute transitions null-safely") {
    val d = Seq(
      (1L, 10, null.asInstanceOf[String]), (1L, 20, null.asInstanceOf[String]),
      (1L, 30, "X"), (1L, 40, null.asInstanceOf[String])
    ).toDF("k", "ts", "status")
    val out = MergeOps.scd2(d, "k", "ts", Seq("status"))
      .select("ts").as[Int].collect().toSet
    // null→null collapses; null→X and X→null are changes
    assert(out == Set(10, 30, 40))
  }

  test("scd2 rejects inputs that collide with its working columns") {
    val bad = snaps.withColumn("is_current", lit(true))
    val e = intercept[IllegalArgumentException] {
      MergeOps.scd2(bad, "k", "ts", Seq("status"))
    }
    assert(e.getMessage.contains("is_current"))
  }

  test("upsertLatest keeps exactly the newest version per key") {
    val out = MergeOps.upsertLatest(snaps, "k", "ts", tie = "status")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(out == Map(1L -> (30, "F"), 2L -> (10, "O"), 3L -> (30, "F")))
  }

  test("applyCdc: winning tombstone erases the key, later re-insert resurrects it") {
    val recs = Seq(
      // key 1: insert → delete (latest) → gone
      (1L, 10, "O", "U"), (1L, 20, "O", "D"),
      // key 2: insert → delete → RE-INSERT after the delete → present
      (2L, 10, "O", "U"), (2L, 20, "O", "D"), (2L, 30, "F", "U"),
      // key 3: plain upsert chain, no tombstone
      (3L, 10, "O", "U"), (3L, 20, "F", "U")
    ).toDF("k", "ts", "status", "op")
    val out = MergeOps.applyCdc(recs, "k", "ts", "op", "op")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(out == Map(2L -> (30, "F"), 3L -> (20, "F")))
  }
}
