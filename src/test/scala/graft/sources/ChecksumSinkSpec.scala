package graft.sources

import graft.SparkSpecBase
import graft.ops.TableChecksum
import org.apache.spark.sql.functions._

class ChecksumSinkSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "a", java.math.BigDecimal.valueOf(10.50)),
    (2L, "b", java.math.BigDecimal.valueOf(20.25)),
    (3L, null.asInstanceOf[String], java.math.BigDecimal.valueOf(0.00))
  ).toDF("id", "s", "v")

  private def cols = Seq(col("id"), col("s"), col("v").cast("decimal(18,2)"))

  private def viaSink(input: org.apache.spark.sql.DataFrame, key: String) = {
    input.select(TableChecksum.rowHash(cols).as("_h"))
      .write.format("graft.sources.ChecksumSink").option("key", key)
      .mode("append").save()
    val (n, sum, x) = ChecksumSink.result(key).get
    (n, sum.toString, x)
  }

  test("commit-merged fingerprint equals the query-path checksum") {
    val q = TableChecksum.checksum(df, cols).collect().head
    val want = (q.getLong(0), q.getString(1), q.getLong(2))
    assert(viaSink(df, "t1") == want)
    // partitioning must not matter: per-task triples merge commutatively
    assert(viaSink(df.repartition(5), "t2") == want)
    assert(viaSink(df.coalesce(1), "t3") == want)
  }

  test("sink rejects a wrong input schema") {
    val e = intercept[Exception] {
      df.select(col("id")).write.format("graft.sources.ChecksumSink")
        .option("key", "bad").mode("append").save()
    }
    assert(e.getMessage.contains("_h"), e.getMessage)
  }
}
