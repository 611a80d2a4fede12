package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Exact heavy hitters through a bounded-memory sketch: Misra–Gries with
  * k counters per partition, candidate merge, then an exact recount of
  * the merged candidates only.
  *
  * Why not a plain groupBy-count? For a 100 TB stream keyed by something
  * high-cardinality (URLs, n-grams, user ids), the full count table is
  * itself huge — but the QUESTION is only "which items exceed n/k". The
  * MG guarantee makes that answerable in k counters per task: every item
  * with partition frequency > n_p/k survives its partition sketch, so the
  * union of partition candidates is a SUPERSET of every global item with
  * frequency > n/k. The exact recount (a broadcast-semi-join-reduced
  * aggregation) then removes false positives — the final answer is
  * IDENTICAL to the full groupBy-count filtered to `cnt · k > n`, which
  * is exactly what the oracle computes. Deterministic output from an
  * order-sensitive sketch: partitioning can change the CANDIDATE set,
  * never the answer.
  *
  * Null items are excluded up front (null is an absence, not an item);
  * the oracle filter mirrors this.
  */
object HeavyHitters {

  /** Items (as strings) whose exact global count × k exceeds the total
    * non-null row count, i.e. frequency > n/k. Output: `(item, cnt)`,
    * exact counts. Two passes over the data: sketch (which also carries
    * the per-partition row tallies — no separate count job) and recount.
    */
  def frequentItems(df: DataFrame, item: Column, k: Int): DataFrame = {
    require(k >= 2, "heavy-hitter threshold needs k >= 2")
    val spark = df.sparkSession
    val items = df.select(item.cast("string").as("item")).filter(col("item").isNotNull)
    // per-partition Misra–Gries (k counters, decrement-all on overflow),
    // emitting the partition's candidates plus its row tally — ≤ (k+1)
    // rows per partition to the driver
    val sketch: Array[(Boolean, String, Long)] = items
      .mapPartitions { rows =>
        var np = 0L
        val counters = scala.collection.mutable.HashMap.empty[String, Long]
        rows.foreach { r =>
          np += 1L
          val v = r.getString(0)
          if (counters.contains(v)) counters(v) += 1L
          else if (counters.size < k) counters(v) = 1L
          else {
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            counters.keysIterator.foreach { key =>
              val c = counters(key) - 1L
              if (c == 0L) dead += key else counters(key) = c
            }
            dead.foreach(counters.remove)
          }
        }
        Iterator.single((false, "", np)) ++
          counters.keysIterator.map(key => (true, key, 0L))
      }(Encoders.tuple(Encoders.scalaBoolean, Encoders.STRING, Encoders.scalaLong))
      .collect()
    val n = sketch.collect { case (false, _, np) => np }.sum
    val candidates = sketch.collect { case (true, key, _) => key }.distinct.toSeq
    // exact recount restricted to the candidate superset: the broadcast
    // semi-join kills non-candidates BEFORE the count shuffle, so the
    // aggregate's key space is ≤ k·partitions however wide the raw
    // item domain is
    import spark.implicits._
    items
      .join(broadcast(candidates.toDF("item")), Seq("item"), "left_semi")
      .groupBy("item")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k.toLong) > lit(n))
  }
}
