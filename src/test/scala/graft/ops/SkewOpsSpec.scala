package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted aggregation equals the plain aggregation exactly (skewed key)") {
    // heavily skewed: 'hot' holds 90% of rows
    val df = (Seq.fill(900)("hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i.toDouble) }.toDF("k", "v")
    val salted = SkewOps.saltedAgg(df, "k", col("v"), saltBuckets = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted.keySet == plain.keySet)
    assert(salted("hot")._1 == 900L)
    plain.foreach { case (k, (n, s)) =>
      assert(salted(k)._1 == n, s"count mismatch for $k")
      assert(math.abs(salted(k)._2 - s) < 1e-6, s"sum mismatch for $k")
    }
  }

  test("saltedCount spreads a hot key over multiple pre-aggregation groups") {
    val df = Seq.fill(1000)("hot").toDF("k")
    val out = SkewOps.saltedCount(df, "k", saltBuckets = 4).collect()
    assert(out.length == 1 && out(0).getLong(1) == 1000L)
  }

  test("salted join equals the plain join exactly, broadcast disabled") {
    // skewed fact: key 1 holds 90% of rows; dim has extra keys (no match)
    // and fact has a key missing from dim (dropped by inner join)
    val big = (Seq.fill(900)(1L) ++ (2L to 100L) ++ Seq(999L))
      .zipWithIndex.map { case (k, i) => (k, i.toDouble) }.toDF("bk", "v")
    val small = (1L to 120L).map(k => (k, s"name$k")).toDF("sk", "name")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val salted = SkewOps.saltedJoin(big, small, "bk", "sk", saltBuckets = 8)
        .groupBy("sk").agg(count(lit(1)).as("cnt"), sum("v").as("s"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val plain = big.join(small, col("bk") === col("sk"))
        .groupBy("sk").agg(count(lit(1)).as("cnt"), sum("v").as("s"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(salted.keySet == plain.keySet)
      assert(salted(1L)._1 == 900L)
      plain.foreach { case (k, (n, s)) =>
        assert(salted(k)._1 == n, s"count mismatch for $k")
        assert(math.abs(salted(k)._2 - s) < 1e-6, s"sum mismatch for $k")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("saltedJoin with explicit saltCols spreads full-duplicate hot rows and stays exact") {
    import spark.implicits._
    // hot key 1 with IDENTICAL payload rows: the default all-column content
    // salt sends them all to one bucket; salting on the unique id spreads
    // them — and the answer must equal the plain join either way
    val big = (1L to 400L).map(i => (i, if (i <= 300) 1L else i % 7 + 2, "same"))
      .toDF("row_id", "bk", "payload")
    val small = (1L to 10L).map(k => (k, s"dim$k")).toDF("sk", "name")
    val salted = SkewOps.saltedJoin(big, small, "bk", "sk",
        saltBuckets = 8, saltCols = Seq("row_id"))
      .groupBy("sk").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = big.join(small, col("bk") === col("sk"))
      .groupBy("sk").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted(1L) == 300L)
    // the id salt actually spreads the hot key's identical rows
    val salts = big.filter(col("bk") === 1L)
      .select(pmod(xxhash64(col("row_id")), lit(8L)).as("s"))
      .distinct().count()
    assert(salts > 1, "unique-id salt should hit multiple buckets")
  }
}
