package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class PqTrainSpec extends SparkSpecBase {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("every (vector, subspace) is encoded exactly once; codes in range") {
    val n = emb.count()
    val stats = PqTrain.trainStats(emb, "vec_id", "embedding",
      dim = 64, m = 8, kCodes = 16, iters = 2)
    val perJ = stats.groupBy("j").agg(sum("n_members").as("tot"))
      .as[(Int, Long)].collect().toMap
    assert(perJ.keySet === (0 until 8).toSet)
    perJ.values.foreach(tot => assert(tot === n))
    val ids = stats.select("cluster_id").as[Int].collect()
    assert(ids.forall(c => c >= 0 && c < 16))
  }

  test("another Lloyd round never increases total inertia (per subspace)") {
    def inertia(iters: Int): Map[Int, Long] =
      PqTrain.trainStats(emb, "vec_id", "embedding",
        dim = 64, m = 8, kCodes = 16, iters = iters)
        .groupBy("j").agg(sum("inertia_micro2").as("s"))
        .as[(Int, Long)].collect().toMap
    val i1 = inertia(1)
    val i2 = inertia(2)
    i1.keys.foreach { j =>
      assert(i2(j) <= i1(j), s"subspace $j: inertia rose ${i1(j)} -> ${i2(j)}")
    }
  }

  test("trained-ADC top-k is a well-formed ranking and self-free") {
    val tk = PqTrain.trainedTopK(emb, "vec_id", "embedding",
      dim = 64, m = 8, kCodes = 16, iters = 2, nQueries = 10, k = 5)
      .collect()
    assert(tk.nonEmpty)
    tk.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val ranks = rows.map(_.getAs[Int]("rank")).sorted
      assert(ranks.toSeq === (1 to rows.length))
      rows.foreach(r => assert(r.getAs[Long]("neighbor_id") !== q))
      // adc is non-increasing down the ranking
      val byRank = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("adc"))
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _           =>
      }
    }
  }

  test("degenerate corpus: identical vectors collapse to one surviving cluster per subspace") {
    val one = Seq.tabulate(20)(i => (i.toLong, Array.fill(64)(0.25f)))
      .toDF("vec_id", "embedding")
    val stats = PqTrain.trainStats(one, "vec_id", "embedding",
      dim = 64, m = 8, kCodes = 4, iters = 2)
    // all points tie at distance 0 to every pivot -> tiebreak keeps
    // cluster 0; later clusters lose every member and drop out
    val rows = stats.collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      assert(r.getAs[Int]("cluster_id") === 0)
      assert(r.getAs[Long]("n_members") === 20L)
      assert(r.getAs[Long]("inertia_micro2") === 0L)
    }
  }
}
