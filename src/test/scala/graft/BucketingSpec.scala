package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketing = pre-shuffled storage. Writing both join sides bucketed by
  * the join key lets Spark plan a SortMergeJoin with ZERO exchanges —
  * the canonical co-located-join strategy for repeated large joins at
  * 100 TB (pay the shuffle once at write time, never at read time).
  */
class BucketingSpec extends SparkSpecBase {

  test("join of two tables bucketed on the key plans no shuffle exchange") {
    val wh = Files.createTempDirectory("graft_wh").toString // explicit table paths; warehouse conf is static
    val orders = core.Tables.orders(spark, sfDir)
    val customer = core.Tables.customer(spark, sfDir)

    orders.write.mode("overwrite")
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    customer.write.mode("overwrite")
      .bucketBy(4, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").saveAsTable("customer_b")

    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))

    // disable broadcast so the join strategy itself is exercised
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val replanned = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
      replanned.collect()
      val tree = replanned.queryExecution.executedPlan.toString
      // the JOIN itself must not shuffle; only the small groupBy above it may
      val joinPart = tree.split("SortMergeJoin").last
      assert(tree.contains("SortMergeJoin"), tree)
      assert(!joinPart.contains("Exchange hashpartitioning(o_custkey")
        && !joinPart.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join still shuffles:\n$tree")
      // and results match the plain join
      val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bucketed = replanned.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bucketed == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
