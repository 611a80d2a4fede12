package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float|double>` columns → double.
  *
  * This is the hot primitive of every similarity/near-dup path (cosine =
  * dot/(√dot·√dot)). The higher-order-function form
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) allocates a zipped
  * intermediate array and evaluates two lambda closures per element; this
  * expression codegens to a single fused primitive loop inside
  * WholeStageCodegen — no allocation, no virtual calls (measured ~3× on
  * the sf0.1 all-pairs cosine).
  *
  * Numerics are IDENTICAL to the HOF form by construction: each element is
  * widened float→double exactly, products accumulate left-to-right in
  * double — so DuckDB-oracle hashes are unchanged. A null element poisons
  * the result to null (like `zip_with` arithmetic), and so does a LENGTH
  * MISMATCH (matching `zip_with`'s null-padding + poisoning): a
  * wrong-dimension embedding surfaces as NULL, never as a
  * plausible-but-wrong prefix dot.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOk(t: DataType): Boolean = t == FloatType || t == DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _)) if elemOk(lt) && elemOk(rt) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_product requires ARRAY<FLOAT|DOUBLE> inputs, got ${l.sql}, ${r.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  @transient private lazy val leftElem: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rightElem: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftElem == FloatType) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightElem == FloatType) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, idx: String, t: DataType): String =
        if (t == FloatType) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |}
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    ${ev.isNull} = true;
         |  } else {
         |    $acc += ${get(a, i, leftElem)} * ${get(b, i, rightElem)};
         |  }
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
