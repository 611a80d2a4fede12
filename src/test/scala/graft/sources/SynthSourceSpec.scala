package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SynthSourceSpec extends SparkSpecBase {

  private def load(rows: Int = 1000, parts: Int = 4) =
    spark.read.format("graft.sources.SynthSource")
      .option("rows", rows).option("parts", parts).load()

  test("generates exactly [0, rows) once, any split count") {
    val ids = load(rows = 100, parts = 7).select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 100L))
  }

  test("bucket matches the portable md5 permille primitive") {
    val got = load(rows = 50).select("id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    import spark.implicits._
    val want = (0L until 50L).toDF("id")
      .select(col("id"), pmod(graft.text.TextOps.md5Hash60(
        concat(col("id").cast("string"), lit(":synth"))), lit(1000L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("id-range filters push into the source and shrink the scan") {
    val df = load(rows = 100000, parts = 8)
      .filter(col("id") >= 20000L && col("id") < 60000L)
    assert(df.count() == 40000L)
    // the range is CONSUMED by the source: no Filter node survives, and
    // the scan's description reports the narrowed bounds
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedRange: [20000, 60000)"), s"range not pushed:\n$plan")
    // no Filter OPERATOR may survive ("RuntimeFilters: []" in the scan
    // description is not one)
    assert(!plan.contains(") Filter") && !plan.contains("- Filter"),
      s"residual filter left behind:\n$plan")
  }

  test("column pruning reaches the reader (pruned scan schema)") {
    val df = load(rows = 100).select("id")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("bucket"), plan)
    assert(df.count() == 100)
  }

  test("micro-batch stream drain equals the batch read") {
    val stream = spark.readStream.format("graft.sources.SynthSource")
      .option("rows", 2000).option("parts", 4).load()
    val drained = graft.streaming.StreamOps.runToCompletion(
        stream.groupBy("bucket").agg(count(org.apache.spark.sql.functions.lit(1)).as("n")),
        "synth_stream_spec")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = load(rows = 2000).groupBy("bucket").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(drained == batch)
  }
}
