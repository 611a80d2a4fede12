package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect()(0).getAs[T]("r")

  private def arr(c: org.apache.spark.sql.Column, text: String): List[String] =
    one[scala.collection.Seq[String]](c, text).toList

  test("tokens lowercases, splits on non-letters, drops empties") {
    assert(arr(TextOps.tokens(col("t")), "Hello, World! 42 foo_bar") ==
      List("hello", "world", "foo", "bar"))
  }

  test("tokens of empty / non-alpha string is empty") {
    assert(arr(TextOps.tokens(col("t")), "123 !!!").isEmpty)
    assert(one[Int](TextOps.tokenCount(col("t")), "") == 0)
  }

  test("shingles: fewer tokens than n yields empty, exact n yields one") {
    assert(arr(TextOps.shingles(col("t"), 3), "a b").isEmpty)
    assert(arr(TextOps.shingles(col("t"), 3), "a b c") == List("a b c"))
    assert(arr(TextOps.shingles(col("t"), 2), "x y z") == List("x y", "y z"))
  }

  test("stopword and alpha ratios") {
    val sw = one[Int](TextOps.stopwordCount(col("t")), "the cat and the dog")
    assert(sw == 3) // the, and, the
    val ar = one[Double](TextOps.alphaRatio(col("t")), "ab12")
    assert(ar == 0.5)
  }

  test("empty string: ratios and quality are 0.0, never NaN") {
    assert(one[Double](TextOps.alphaRatio(col("t")), "") == 0.0)
    assert(one[Double](TextOps.punctRatio(col("t")), "") == 0.0)
    assert(one[Double](TextOps.qualityScore(col("t")), "") == 0.0)
  }

  test("token-free documents keep DISTINCT fingerprints (raw-text fallback)") {
    val fp1 = one[String](TextOps.fingerprintMd5(col("t")), "911")
    val fp2 = one[String](TextOps.fingerprintMd5(col("t")), "411")
    assert(fp1 != fp2, "digits-only docs must not collapse to md5 of empty")
  }

  test("rollingHash and fingerprint are deterministic and ignore case/punct") {
    val a = one[Long](TextOps.rollingHash(col("t")), "Hello World")
    val b = one[Long](TextOps.rollingHash(col("t")), "hello, world!")
    assert(a == b)
    val fa = one[String](TextOps.fingerprintMd5(col("t")), "Hello World")
    val fb = one[String](TextOps.fingerprintMd5(col("t")), "hello... world")
    assert(fa == fb && fa.length == 32)
  }

  test("langId picks CJK by script and others by marker words") {
    assert(one[String](TextOps.langId(col("t")), "这是 中文 文本") == "zh")
    assert(one[String](TextOps.langId(col("t")), "the cat is with the dog") == "en")
    assert(one[String](TextOps.langId(col("t")), "der hund und die katze ist") == "de")
  }

  test("tokenCountBpeIsh counts ceil(len/4) pieces per word plus digit runs") {
    // "hello"(2) + "hi"(1) + digits "123"(1) = 4
    assert(one[Long](TextOps.tokenCountBpeIsh(col("t")), "hello hi 123") == 4L)
  }

  test("scrubPii redacts emails, URLs, phones; placeholders never re-match") {
    val in = "mail bob.smith+1@ex-ample.co.uk see https://x.io/a?b=1 call 415-555-1234 or 4155551234 end"
    val out = one[String](TextOps.scrubPii(col("t")), in)
    assert(out == "mail <EMAIL> see <URL> call <PHONE> or <PHONE> end")
    // idempotent: scrubbing scrubbed text changes nothing
    assert(one[String](TextOps.scrubPii(TextOps.scrubPii(col("t"))), in) == out)
  }

  test("scrubPii leaves near-misses alone") {
    val in = "a@b x http:/nope 12-34-56 415-555-123 value 1234567890123"
    assert(one[String](TextOps.scrubPii(col("t")), in) == in)
  }
}
