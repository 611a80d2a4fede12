package graft.core

import java.nio.file.{Files, Paths}

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Ingestion robustness — what a 100 TB landing zone actually throws at
  * a pipeline: malformed records mixed into good files, and schema drift
  * between write generations. Both must degrade into *quarantine* and
  * *union*, never into a failed job or silent row loss.
  */
class IngestionRobustnessSpec extends SparkSpecBase {

  test("corrupt JSON lines quarantine via PERMISSIVE + _corrupt_record, good rows survive") {
    val dir = Files.createTempDirectory("graft_corrupt").toString
    val f = Paths.get(dir, "data.json")
    Files.writeString(f,
      """{"id": 1, "v": "a"}
        |{"id": 2, "v": "b"}
        |{not json at all
        |{"id": 3, "v": "c"}
        |also garbage
        |""".stripMargin)
    val df = spark.read
      .schema("id LONG, v STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache() // SPARK-21610: corrupt-record column queries need a materialized frame
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() == 3, "all well-formed rows must survive")
    assert(bad.count() == 2, "every malformed line must be quarantined, not dropped")
    assert(good.agg(sum("id")).collect()(0).getLong(0) == 6L)
    df.unpersist()
  }

  test("parquet schema evolution: mergeSchema unions write generations, old rows null-fill") {
    val dir = Files.createTempDirectory("graft_evolve").toString
    import spark.implicits._
    // generation 1: (id, v) — generation 2 adds a column
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$dir/gen=1")
    Seq((3L, "c", 9.5), (4L, "d", 0.5)).toDF("id", "v", "score")
      .write.parquet(s"$dir/gen=2")
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.toSet == Set("id", "v", "score", "gen"))
    assert(df.count() == 4)
    // old generation rows surface the new column as NULL, not an error
    assert(df.filter(col("gen") === 1 && col("score").isNull).count() == 2)
    assert(df.agg(sum("score")).collect()(0).getDouble(0) == 10.0)
  }

  test("FAILFAST mode rejects a corrupt batch loudly (the quarantine opt-out)") {
    val dir = Files.createTempDirectory("graft_failfast").toString
    Files.writeString(Paths.get(dir, "data.json"),
      "{\"id\": 1}\nnot-json\n")
    val thrown = intercept[org.apache.spark.SparkException] {
      spark.read.schema("id LONG")
        .option("mode", "FAILFAST").json(dir).collect()
    }
    assert(thrown.getMessage != null)
  }
}
