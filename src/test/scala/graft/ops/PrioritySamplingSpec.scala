package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PrioritySamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private val pop = (1L to 100L).map(i => (i, 1.0)).toDF("id", "w")

  test("deterministic: identical runs select identical rows in any order") {
    val a = PrioritySampling.sample(pop, "id", "w", k = 10)
      .collect().map(_.getAs[Long]("id")).toSet
    val b = PrioritySampling.sample(pop.orderBy(desc("id")).repartition(5), "id", "w", k = 10)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(a == b && a.size == 10)
  }

  test("k >= population returns every positive-weight row; nonpositive excluded") {
    val mixed = Seq((1L, 2.0), (2L, 0.0), (3L, -1.0), (4L, 5.0)).toDF("id", "w")
    val out = PrioritySampling.sample(mixed, "id", "w", k = 10)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(out == Set(1L, 4L))
  }

  test("a dominant weight is always selected") {
    // weight 1e12 → clock ~1e-12 of a unit-weight row: first pick
    val skewed = pop.union(Seq((999L, 1e12)).toDF("id", "w"))
    val out = PrioritySampling.sample(skewed, "id", "w", k = 5)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(out.contains(999L))
  }

  test("weighting shifts selection mass toward heavy rows") {
    // two strata: ids 1-50 weight 10, ids 51-100 weight 1 — the heavy
    // stratum must dominate a k=20 sample (deterministically, given the
    // fixed hash stream: expected ~18 of 20)
    val strata = (1L to 100L).map(i => (i, if (i <= 50) 10.0 else 1.0)).toDF("id", "w")
    val heavy = PrioritySampling.sample(strata, "id", "w", k = 20)
      .collect().map(_.getAs[Long]("id")).count(_ <= 50L)
    assert(heavy >= 14, s"heavy stratum got $heavy of 20")
  }
}
