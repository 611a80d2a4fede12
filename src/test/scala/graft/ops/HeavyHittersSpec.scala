package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpecBase {
  import spark.implicits._

  test("frequent items equal the exact groupBy-count answer (skewed data)") {
    // 'hot' = 50%, 'warm' = 25%, 200 cold singletons fill the tail
    val data = Seq.fill(400)("hot") ++ Seq.fill(200)("warm") ++ (1 to 200).map(i => s"cold$i")
    val df = data.toDF("x").repartition(7) // force multi-partition sketches
    val out = HeavyHitters.frequentItems(df, col("x"), k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n=800, threshold n/5=160: hot (400) and warm (200) qualify
    assert(out == Map("hot" -> 400L, "warm" -> 200L))
  }

  test("no item above threshold yields an empty result, not false positives") {
    val df = (1 to 1000).map(i => s"u$i").toDF("x").repartition(5)
    assert(HeavyHitters.frequentItems(df, col("x"), k = 4).count() == 0L)
  }

  test("answer is invariant to partitioning even though the sketch is not") {
    val data = Seq.fill(300)("a") ++ Seq.fill(299)("b") ++ (1 to 401).map(i => s"z$i")
    val r1 = HeavyHitters.frequentItems(data.toDF("x").coalesce(1), col("x"), k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val r13 = HeavyHitters.frequentItems(data.toDF("x").repartition(13), col("x"), k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // n=1000, threshold 250: exactly a and b, from any partitioning
    assert(r1 == Set(("a", 300L), ("b", 299L)))
    assert(r13 == r1)
  }

  test("adversarial order: heavy tail interleaved before the heavy item") {
    // the heavy item arrives LAST in every partition — eviction pressure
    // is maximal when its run starts
    val data = (1 to 600).map(i => s"t$i") ++ Seq.fill(400)("late")
    val df = data.toDF("x").coalesce(1)
    val out = HeavyHitters.frequentItems(df, col("x"), k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("late" -> 400L)) // threshold 1000/3 ≈ 333
  }

  test("nulls are excluded from items and from the total") {
    val df = (Seq.fill(10)(Some("a")) ++ Seq.fill(5)(None)).toDF("x")
    val out = HeavyHitters.frequentItems(df, col("x"), k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 10L)) // 10 · 2 > 10 (not > 15)
  }
}
