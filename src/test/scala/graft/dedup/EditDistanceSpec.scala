package graft.dedup

import graft.SparkSpecBase

class EditDistanceSpec extends SparkSpecBase {
  import spark.implicits._

  private val names = Seq(
    "red widget", "rad widget",      // dist 1, same length band
    "blue bolt", "blue bolts",       // dist 1, lengths 9/10 — crosses a /4 band at 8|12? no: both band 2
    "gear", "gears x",               // dist 3, lengths 4 and 7: bands 1 vs 1 — adjacent-band probe not needed
    "pin", "pinion",                 // dist 3, lengths 3 and 6: band 0 vs band 1 — needs the ±1 probe
    "unrelated thing"
  ).map(Tuple1(_)).toDF("name")

  private def brute(maxDist: Int): Set[(String, String, Int)] = {
    val vals = names.collect().map(_.getString(0)).distinct
    (for {
      a <- vals; b <- vals if a < b
      d = levenshteinRef(a, b) if d <= maxDist
    } yield (a, b, d)).toSet
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("editDistancePairs equals the unblocked quadratic (lossless banding)") {
    val out = Dedup.editDistancePairs(names, "name", maxDist = 3, bandWidth = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(out == brute(3))
    // the cross-band pair must be present — proves the ±1-band probe works
    assert(out.exists { case (a, b, _) => a == "pin" && b == "pinion" })
  }

  test("editDistancePairs deduplicates multi-band candidate collisions") {
    val out = Dedup.editDistancePairs(names, "name", maxDist = 3, bandWidth = 4)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.length == out.distinct.length)
  }

  test("editDistancePairs rejects a band width that can lose pairs") {
    intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(names, "name", maxDist = 4, bandWidth = 4)
    }
  }
}
