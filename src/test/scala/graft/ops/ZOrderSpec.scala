package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpecBase {
  import spark.implicits._

  // full 16×16 grid — every (x, y) in [0,16)²
  private def grid = (for { x <- 0 until 16; y <- 0 until 16 } yield (x, y, x * 16 + y))
    .toDF("x", "y", "id")

  test("zValue interleaves bits (known Morton codes)") {
    val out = Seq((1, 0), (0, 1), (3, 3), (5, 2))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 4).as("z"))
      .collect().map(_.getAs[Long]("z")).toSeq
    // z(1,0)=1, z(0,1)=2, z(3,3)=15, z(5,2)= x bits {0,2}→1+16, y bit {1}→8
    assert(out == Seq(1L, 2L, 15L, 25L))
  }

  test("zValue is a bijection on the grid") {
    val n = grid.select(ZOrder.zValue(col("x"), col("y"), 4).as("z"))
      .distinct().count()
    assert(n == 256L)
  }

  test("layoutStats buckets cover narrow boxes on BOTH dimensions") {
    val stats = ZOrder.layoutStats(grid, col("x"), col("y"), col("id"),
      bits = 4, nBuckets = 16).collect()
    assert(stats.length == 16)
    assert(stats.map(_.getAs[Long]("n")).sum == 256L)
    // 16 consecutive z codes sit inside at most two adjacent 4×4 blocks
    stats.foreach { r =>
      assert(r.getAs[Int]("max_x") - r.getAs[Int]("min_x") <= 7)
      assert(r.getAs[Int]("max_y") - r.getAs[Int]("min_y") <= 7)
    }
    // a plain x-sort would give every bucket the FULL y range — z must not
    assert(stats.exists(r => r.getAs[Int]("max_y") - r.getAs[Int]("min_y") < 15))
  }

  test("applyLayout range-partitions by z and keeps all rows sorted within partitions") {
    val laid = ZOrder.applyLayout(grid, ZOrder.zValue(col("x"), col("y"), 4), nFiles = 4)
    assert(laid.count() == 256L)
    assert(laid.rdd.getNumPartitions == 4)
    // each partition must cover a bounded z-contiguous box, far smaller
    // than the full grid (the file-skipping property)
    val boxes = laid
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("x").as("nx"), max("x").as("xx"), min("y").as("ny"), max("y").as("xy"))
      .collect()
    boxes.foreach { r =>
      val area = (r.getAs[Int]("xx") - r.getAs[Int]("nx") + 1).toLong *
        (r.getAs[Int]("xy") - r.getAs[Int]("ny") + 1).toLong
      assert(area <= 160L, s"partition box too wide: $r") // full grid is 256
    }
  }
}
