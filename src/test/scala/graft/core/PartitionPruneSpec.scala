package graft.core

import graft.SparkSpecBase
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Proves the partitioned-parquet sink (`s7_partitioned_prune`) actually
  * prunes: a filter on the partition column must be resolved at planning
  * time (directory listing), never by scanning row data.
  */
class PartitionPruneSpec extends SparkSpecBase {

  test("filter on partitionBy column prunes to a single partition directory") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_prune_spec"
    Sinks.parquet(
      Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"),
      out, partitionBy = Seq("o_orderpriority"))

    val pruned = spark.read.parquet(out).filter(col("o_orderpriority") === "1-URGENT")
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))

    assert(scan.partitionFilters.nonEmpty,
      "partition-column predicate must become a PartitionFilter")
    // 5 priority values exist; the scan must touch exactly the one matching dir
    assert(scan.relation.partitionSchema.fieldNames.contains("o_orderpriority"))
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 partition dir selected, got ${scan.selectedPartitions.partitionCount}")

    // and the answer matches the unpartitioned source
    val expected = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(pruned.count() == expected)
  }
}
