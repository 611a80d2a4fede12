package graft.expr

import graft.SparkSpecBase
import graft.functions.GraftFunctions.dot_product
import org.apache.spark.sql.functions._

class DotProductExpressionSpec extends SparkSpecBase {
  import spark.implicits._

  test("dot_product over float and double arrays, known values") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0))).toDF("f", "d")
    val r = df.select(
      dot_product(col("f"), col("d")).as("fd"),
      dot_product(col("f"), col("f")).as("ff"),
      dot_product(col("d"), col("d")).as("dd")).collect()(0)
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 14.0)
    assert(r.getDouble(2) == 77.0)
  }

  test("dot_product matches the HOF aggregate(zip_with) form bit-for-bit") {
    val rnd = new scala.util.Random(3)
    val df = (1 to 50).map(_ => (Array.fill(64)(rnd.nextGaussian().toFloat),
      Array.fill(64)(rnd.nextGaussian().toFloat))).toDF("a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val diff = df.select((dot_product(col("a"), col("b")) - hof).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getDouble(0)
    assert(diff == 0.0, s"native vs HOF diverged by $diff")
  }

  test("null array → null result; null element poisons the product") {
    val df = Seq(
      (Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(3.0f), Some(4.0f)))),
      (None, Some(Seq(Some(3.0f), Some(4.0f)))),
      (Some(Seq(Some(1.0f), None)), Some(Seq(Some(3.0f), Some(4.0f))))
    ).toDF("a", "b")
    val out = df.select(dot_product(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
  }

  test("length mismatch → null (matches zip_with null-padding + poisoning)") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f))).toDF("a", "b")
    val native = df.select(dot_product(col("a"), col("b")).as("d")).collect()(0)
    assert(native.isNullAt(0), "wrong-dimension input must surface as NULL, not a prefix dot")
    val hof = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("d")).collect()(0)
    assert(hof.isNullAt(0)) // the HOF form agrees
  }

  test("interpreted eval agrees with codegen") {
    val df = Seq((Array(1.5f, -2.5f), Array(2.0f, 3.0f))).toDF("a", "b")
    // filter forces a codegen path; collect-side select covers eval
    val viaCodegen = df.filter(dot_product(col("a"), col("b")) < 0)
      .count()
    assert(viaCodegen == 1) // 3.0 - 7.5 = -4.5
    val expr = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.5f, -2.5f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2.0f, 3.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(expr.eval(null) == -4.5)
  }
}
