package graft.core

import java.nio.file.Files

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpecBase {
  import spark.implicits._

  private val data = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5))

  test("csv sink roundtrip preserves rows and header (S6)") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/out"
    Sinks.csv(data.toDF("id", "grp", "v"), dir, singleFile = true)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() == 3)
    assert(back.columns.toSeq == Seq("id", "grp", "v"))
    assert(back.agg(sum("v")).collect()(0).getDouble(0) == 7.5)
  }

  test("parquet sink with partitionBy produces partition directories") {
    val dir = Files.createTempDirectory("graft_pq").toString + "/out"
    Sinks.parquet(data.toDF("id", "grp", "v"), dir, partitionBy = Seq("grp"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("grp=")))
    // partition pruning: reading one partition filters at the source
    assert(back.filter(col("grp") === "a").count() == 2)
  }

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))

  test("parquetSized splits one task's output at the per-file row cap") {
    val dir = Files.createTempDirectory("graft_sized").toString + "/out"
    val df = spark.range(1000).toDF("id").coalesce(1) // one task, 1000 rows
    Sinks.parquetSized(df, dir, maxRecordsPerFile = 100L)
    assert(parquetFiles(dir).length == 10, parquetFiles(dir).mkString(","))
    assert(spark.read.parquet(dir).count() == 1000L)
  }

  test("compact rewrites a many-small-files dataset into the target file count") {
    val small = Files.createTempDirectory("graft_small").toString + "/in"
    spark.range(400).toDF("id").repartition(40).write.parquet(small) // 40 tiny files
    assert(parquetFiles(small).length == 40)
    val out = Files.createTempDirectory("graft_small").toString + "/out"
    Sinks.compact(spark, small, numFiles = 4, out)
    assert(parquetFiles(out).length == 4, parquetFiles(out).mkString(","))
    assert(spark.read.parquet(out).agg(sum("id")).collect()(0).getLong(0)
      == (0L until 400L).sum)
  }

  test("SchemaOps.selectNumeric keeps exactly the numeric columns (P9)") {
    val df = data.toDF("id", "grp", "v")
    assert(graft.ops.SchemaOps.selectNumeric(df).columns.toSeq == Seq("id", "v"))
  }

  test("SchemaOps.nullCounts counts per-column nulls in one pass (E2)") {
    val df = Seq((Some(1), Some("x")), (None, Some("y")), (Some(3), None))
      .toDF("a", "b")
    val r = graft.ops.SchemaOps.nullCounts(df).collect()(0)
    assert(r.getAs[Long]("total_rows") == 3)
    assert(r.getAs[Long]("nulls_a") == 1)
    assert(r.getAs[Long]("nulls_b") == 1)
  }
}
