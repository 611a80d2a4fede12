package graft

import org.apache.spark.sql.functions._

class SparkEntrySpec extends SparkSpecBase {

  test("entry (flagship cohort query) returns label counts > 0") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("count")).sum > 0)
  }

  test("every query has either an oracle or is explicitly rows-only") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  test("seeded sampling is deterministic: same seed, same counts twice") {
    val q = SparkEntry.queries("o3_sample_split")
    val a = q(spark, sfDir).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = q(spark, sfDir).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.sum == 1500) // all orders land in exactly one split at sf0.001
  }

  test("undersample balances classes to roughly 1:1") {
    val counts = SparkEntry.queries("o4_undersample")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ratio = counts("0").toDouble / counts("1")
    assert(ratio > 0.5 && ratio < 2.0, s"unbalanced after undersample: $counts")
  }
}
