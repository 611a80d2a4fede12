package graft.dedup

import graft.SparkSpecBase

class EditDistanceSpec extends SparkSpecBase {
  import spark.implicits._

  private val names = Seq(
    "red widget", "rad widget",      // dist 1, same length
    "blue bolt", "blue bolts",       // dist 1, lengths 9/10
    "gear", "gears x",               // dist 3, lengths 4 and 7
    "pin", "pinion",                 // dist 3, lengths 3 and 6 — short tier probes a long string
    "ab", "b",                       // dist 1, both in the short tier
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

  test("editDistancePairs equals the unblocked quadratic (lossless PassJoin blocking)") {
    val out = Dedup.editDistancePairs(names, "name", maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(out == brute(3))
    // the short-tier-to-long pair must be present
    assert(out.exists { case (a, b, _) => a == "pin" && b == "pinion" })
    // and the short-short pair
    assert(out.exists { case (a, b, _) => a == "ab" && b == "b" })
  }

  test("editDistancePairs also lossless at maxDist 1 and 2") {
    for (d <- Seq(1, 2)) {
      val out = Dedup.editDistancePairs(names, "name", maxDist = d)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(out == brute(d), s"mismatch at maxDist=$d")
    }
  }

  test("editDistancePairs deduplicates multi-slot candidate collisions") {
    val out = Dedup.editDistancePairs(names, "name", maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.length == out.distinct.length)
  }

  test("editDistancePairs randomized losslessness against the quadratic") {
    // deterministic pseudo-random word soup with heavy near-duplication
    val rng = new scala.util.Random(42)
    val base = Seq("widget", "gadget", "bolt", "gear", "pin", "flange")
    val soup = (1 to 120).map { _ =>
      val w = base(rng.nextInt(base.size)).toCharArray
      val mutated = (0 until rng.nextInt(3)).foldLeft(new String(w)) { (s, _) =>
        val p = rng.nextInt(s.length)
        rng.nextInt(3) match {
          case 0 => s.substring(0, p) + ('a' + rng.nextInt(26)).toChar + s.substring(math.min(p + 1, s.length))
          case 1 => s.substring(0, p) + s.substring(math.min(p + 1, s.length)) // delete
          case _ => s.substring(0, p) + ('a' + rng.nextInt(26)).toChar + s.substring(p) // insert
        }
      }
      mutated
    }.filter(_.nonEmpty).distinct
    val df = soup.map(Tuple1(_)).toDF("name")
    val got = Dedup.editDistancePairs(df, "name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val want = (for {
      a <- soup; b <- soup if a < b
      d = levenshteinRef(a, b) if d <= 2
    } yield (a, b, d)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("editDistancePairs rejects maxDist < 1") {
    intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(names, "name", maxDist = 0)
    }
  }
}
