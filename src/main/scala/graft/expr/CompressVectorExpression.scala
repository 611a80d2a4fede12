package graft.expr

import org.apache.spark.ml.linalg.{SQLDataTypes, Vector}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, UserDefinedType}

/** Re-encode an ML vector in its cheaper form (`Vector.compressed`):
  * sparse when fewer than half the entries are nonzero, dense otherwise.
  *
  * Why it exists: `array_to_vector` ALWAYS emits a dense vector, so any
  * vector synthesized through array arithmetic — SMOTE interpolation is
  * the engine's case (reference O9, Hap880_Final_Project.py:814-817) —
  * materializes every zero of a 3,019-wide bag-of-words row. The
  * interpolated point's support is only the UNION of its two parents'
  * supports (~70 of 3,019 at MIMIC scale), so compressing cuts the
  * synthetic rows' memory and every downstream L-BFGS gradient pass by
  * ~40× per row (measured: the SMOTE CV grid at 67k × 3,019 ran 2× the
  * equal-size RandomOverSampler grid purely from dense synthetic rows).
  *
  * Values are IDENTICAL — only the encoding changes. Interpreted eval
  * (CodegenFallback) is fine here: it runs once per SYNTHESIZED row at
  * resample time, never inside an iterated fit loop.
  */
case class CompressVector(child: Expression)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val udt =
    SQLDataTypes.VectorType.asInstanceOf[UserDefinedType[Vector]]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case u: UserDefinedType[_] if u.userClass == classOf[Vector] ||
        classOf[Vector].isAssignableFrom(u.userClass) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"compress_vector requires a VECTOR input, got ${other.sql}")
  }

  override def dataType: DataType = SQLDataTypes.VectorType
  override def prettyName: String = "compress_vector"

  override protected def nullSafeEval(input: Any): Any =
    udt.serialize(udt.deserialize(input).compressed)

  override protected def withNewChildInternal(newChild: Expression): CompressVector =
    copy(child = newChild)
}
