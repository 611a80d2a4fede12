package graft.ops

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpecBase {

  test("bloom semi-join equals plain left-semi join exactly") {
    val li = Tables.table(spark, sfDir, "lineitem").select("l_orderkey", "l_extendedprice")
    val ord = Tables.table(spark, sfDir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    val bloom = BloomJoin.semiJoin(li, "l_orderkey", ord, "o_orderkey", expectedItems = 10000L)
    val plain = li.join(ord.select("o_orderkey").distinct(),
      li("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(bloom.count() === plain.count())
    assert(bloom.exceptAll(plain).isEmpty && plain.exceptAll(bloom).isEmpty)
  }

  test("empty build side yields empty result, no crash") {
    val li = Tables.table(spark, sfDir, "lineitem").select("l_orderkey")
    val none = Tables.table(spark, sfDir, "orders").filter(lit(false))
    assert(BloomJoin.semiJoin(li, "l_orderkey", none, "o_orderkey").isEmpty)
  }

  test("undersized sketch (high FP rate) still yields the exact answer") {
    val li = Tables.table(spark, sfDir, "lineitem").select("l_orderkey")
    val ord = Tables.table(spark, sfDir, "orders")
    // expectedItems=1 forces a tiny, saturated bloom — false positives
    // everywhere; the trailing exact join must still clear them all
    val bloom = BloomJoin.semiJoin(li, "l_orderkey", ord, "o_orderkey", expectedItems = 1L)
    val plain = li.join(ord.select("o_orderkey").distinct(),
      li("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(bloom.count() === plain.count())
  }
}
