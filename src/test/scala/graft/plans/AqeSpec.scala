package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Adaptive Query Execution is the runtime half of the 100 TB story: static
  * planning can't know real partition sizes, so AQE re-plans mid-query —
  * coalescing undersized shuffle partitions and splitting skewed ones.
  * These tests pin that the engine's session config actually lets AQE do
  * both (thresholds scaled down so the behavior triggers on test data).
  */
class AqeSpec extends SparkSpecBase {

  /** AQE wraps materialized stages in QueryStageExec LEAF nodes — a plain
    * `collect` stops at the stage boundary. Walk through them.
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.flatMap {
      case q: QueryStageExec => q +: allNodes(q.plan)
      case n                 => Seq(n)
    }

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val conf = spark.conf
    val saved = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("AQE coalesces an over-partitioned shuffle at runtime") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "64",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8MB") {
      val df = graft.core.Tables.orders(spark, sfDir)
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
      df.collect()
      val adaptive = df.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
        .getOrElse(fail("AQE did not engage"))
      val reads = allNodes(adaptive.executedPlan).collect { case r: AQEShuffleReadExec => r }
      assert(reads.nonEmpty, "expected an AQEShuffleRead in the final plan")
      // 1.5k orders in 64 static partitions → AQE folds them to a handful
      assert(reads.head.partitionSpecs.length < 64,
        s"expected coalesced reader, got ${reads.head.partitionSpecs.length} partitions")
    }
  }

  test("AQE splits a skewed join partition instead of letting one task drag") {
    import spark.implicits._
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "4") {
      // one pathological key carrying ~98% of rows, plus a long tail
      val left = spark.range(200000)
        .select(when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          concat(lit("payload_payload_payload_"), col("id")).as("v"))
      val right = spark.range(500).select(col("id").as("k"), lit("dim").as("d"))
      val joined = left.join(right, "k")
      // materialize through THIS Dataset's own QueryExecution — count()
      // would plan a separate query and leave `joined`'s adaptive plan
      // unexecuted (still the initial, un-reoptimized form)
      assert(joined.collect().length > 0)
      val adaptive = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
        .getOrElse(fail("AQE did not engage"))
      val smj = allNodes(adaptive.executedPlan).collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, "expected a sort-merge join")
      assert(smj.exists(_.isSkewJoin),
        s"expected isSkewJoin=true; final plan:\n${adaptive.executedPlan}")
    }
  }
}
