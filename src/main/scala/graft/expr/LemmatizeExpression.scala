package graft.expr

import graft.text.Lemmatizer
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for lemmatization (reference E16's
  * lemmatize step, Hap880_Final_Project.py:309-310) — the engine-native
  * alternative to a Scala UDF (SURVEY §7.4: "custom Expression with
  * codegen" beats UDF).
  *
  * Why it matters at 100 TB: a UDF forces serialization to JVM objects
  * and blocks expression fusion; these expressions generate inline Java
  * in the WholeStageCodegen body — the token array never leaves Tungsten
  * memory except for the String round-trip inside the (static, shared)
  * rule engine.
  */

/** lemmatize(string) → string */
case class Lemmatize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lemmatize requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "lemmatize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Lemmatizer.lemma(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.text.Lemmatizer.lemma($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Lemmatize =
    copy(child = newChild)
}

/** lemmatize_all(array<string>) → array<string> — the token-array form
  * used by the text featurization pipeline. Codegen emits a tight loop
  * over the ArrayData, no boxing of the array itself.
  */
case class LemmatizeAll(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lemmatize_all requires ARRAY<STRING> input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType,
    child.dataType match {
      case ArrayType(_, n) => n
      case _               => true
    })
  override def prettyName: String = "lemmatize_all"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[AnyRef](arr.numElements())
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        out(i) = UTF8String.fromString(Lemmatizer.lemma(arr.getUTF8String(i).toString))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val arr = ctx.freshName("arr")
      s"""
         |final int $n = $c.numElements();
         |final org.apache.spark.unsafe.types.UTF8String[] $arr =
         |  new org.apache.spark.unsafe.types.UTF8String[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    $arr[$i] = org.apache.spark.unsafe.types.UTF8String.fromString(
         |      graft.text.Lemmatizer.lemma($c.getUTF8String($i).toString()));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LemmatizeAll =
    copy(child = newChild)
}

object LemmatizeExpression {
  val lemmatizeInfo = new ExpressionInfo(classOf[Lemmatize].getName, "lemmatize")
  val lemmatizeAllInfo = new ExpressionInfo(classOf[LemmatizeAll].getName, "lemmatize_all")
}
