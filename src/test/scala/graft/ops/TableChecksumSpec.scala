package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TableChecksumSpec extends SparkSpecBase {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", java.math.BigDecimal.valueOf(10.50)),
    (2L, "b", java.math.BigDecimal.valueOf(20.25)),
    (3L, null.asInstanceOf[String], java.math.BigDecimal.valueOf(0.00))
  ).toDF("id", "s", "v")

  private def cols = Seq(col("id"), col("s"), col("v").cast("decimal(18,2)"))

  private def fp(df: org.apache.spark.sql.DataFrame) = {
    val r = TableChecksum.checksum(df, cols).collect().head
    (r.getAs[Long]("n_rows"), r.getAs[String]("hash_sum"),
      r.getAs[Long]("hash_xor"))
  }

  test("fingerprint is invariant under row order and partitioning") {
    val a = fp(base)
    assert(a == fp(base.orderBy(desc("id"))))
    assert(a == fp(base.repartition(7)))
    assert(a == fp(base.coalesce(1)))
  }

  test("any single-value change moves the fingerprint") {
    val a = fp(base)
    val changed = base.withColumn("v",
      when(col("id") === 2L, lit(java.math.BigDecimal.valueOf(20.26))).otherwise(col("v")))
    assert(a != fp(changed))
    val dropped = fp(base.filter(col("id") =!= 3L))
    assert(a != dropped && dropped._1 == 2L)
  }

  test("NULL is distinguished from the string 'NULL'") {
    val withNull = Seq((1L, null.asInstanceOf[String], java.math.BigDecimal.ONE))
      .toDF("id", "s", "v")
    val withLiteral = Seq((1L, "NULL", java.math.BigDecimal.ONE))
      .toDF("id", "s", "v")
    assert(fp(withNull) != fp(withLiteral))
  }

  test("offsetting swap that preserves the sum is caught by count or xor") {
    // swapping two rows' ids leaves the multiset identical -> same prints;
    // but replacing a row with another row's content halves the distinct
    // content: sum changes. This pins that hash_sum actually sums per-row.
    val dupRow = base.filter(col("id") === 1L)
      .union(base.filter(col("id") === 1L))
    val two = base.filter(col("id") <= 2L)
    assert(fp(dupRow) != fp(two))
  }
}
