package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Columnar vector math over `array<float>` embedding columns, built from
  * Spark's codegen'd higher-order functions (`zip_with`/`aggregate`) — no
  * UDFs, so the whole computation stays inside WholeStageCodegen and
  * vectorized Parquet reads feed it directly.
  *
  * All arithmetic is double-precision, accumulated left-to-right, so
  * results are bit-deterministic and engine-comparable.
  */
object VectorOps {

  /** Left-to-right double-precision dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

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
