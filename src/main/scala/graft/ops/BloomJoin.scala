package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction — the classic 100 TB scan-thinning
  * technique (the manual form of Spark's own runtime row-level filtering,
  * SPARK-32268): build a compact bloom sketch of the small side's join
  * keys with a DISTRIBUTED aggregate, ship only the sketch (KBs–MBs) to
  * the driver, and pre-filter the big side with a codegen'd
  * `might_contain` BEFORE its shuffle. Rows that cannot possibly join are
  * dropped at the scan, so the exchange moves |matching| + ε rows instead
  * of |big|.
  *
  * The bloom is one-sided-error (false positives only), so the exact
  * semi-join that follows keeps the answer EXACTLY equal to a plain
  * semi-join — which is the DuckDB oracle. What the sketch buys is not
  * semantics but shuffle volume; at 1000 executors the pre-filter runs
  * scan-local with zero extra shuffles.
  *
  * Built on Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * expressions (spark/sql/catalyst/expressions/BloomFilterMightContain
  * .scala) rather than a driver-side `stat.bloomFilter` + ScalaUDF: both
  * sides stay inside whole-stage codegen, and the probe hashes with the
  * same XxHash64 the aggregate used.
  */
object BloomJoin {

  /** Exact left-semi join of `big` against `small`'s keys, with a bloom
    * pre-filter on the big side.
    *
    * @param expectedItems sizing hint for the sketch (≈ distinct small-side
    *                      keys); oversizing costs bytes, undersizing costs
    *                      false-positive rate — never correctness.
    */
  def semiJoin(
      big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long = 1000000L
  ): DataFrame = {
    val spark = big.sparkSession
    // distributed sketch build: partial blooms merge like any agg buffer;
    // only the finished sketch crosses to the driver (bounded by numBits,
    // not by |small|)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(Shim.catalystExpression(spark, small(smallKey)))),
      expectedItems).toAggregateExpression()
    val sketch = small.select(Shim.column(agg).as("bf")).head()
    val pre =
      if (sketch.isNullAt(0)) big.limit(0) // empty build side ⇒ nothing joins
      else {
        val probe = new BloomFilterMightContain(
          Literal(sketch.getAs[Array[Byte]](0), BinaryType),
          new XxHash64(Seq(Shim.catalystExpression(spark, big(bigKey)))))
        big.filter(Shim.column(probe))
      }
    // the exact join clears bloom false positives; the build side is the
    // small one, so let it broadcast
    val keys = small.select(col(smallKey)).distinct()
    pre.join(keys, pre(bigKey) === keys(smallKey), "left_semi")
  }
}
