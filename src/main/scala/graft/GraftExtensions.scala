package graft

import graft.expr.{DotProduct, Lemmatize, LemmatizeAll, LemmatizeExpression}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions injector: registers the engine's native
  * expressions so they are callable from SQL (`SELECT lemmatize(word)`)
  * as well as the Column API.
  *
  * Enable with:
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)          // programmatic
  * or  .config("spark.sql.extensions", "graft.GraftExtensions")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("lemmatize"),
      LemmatizeExpression.lemmatizeInfo,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Lemmatize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("lemmatize_all"),
      LemmatizeExpression.lemmatizeAllInfo,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LemmatizeAll(children.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      GraftExtensions.dotProductInfo,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(children(0), children(1))))
  }
}

object GraftExtensions {
  val dotProductInfo = new ExpressionInfo(classOf[DotProduct].getName, "dot_product")

  /** Register the same functions into an already-running session
    * (extensions normally apply at session build time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("lemmatize"), LemmatizeExpression.lemmatizeInfo,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Lemmatize(children.head))
    reg.registerFunction(
      FunctionIdentifier("lemmatize_all"), LemmatizeExpression.lemmatizeAllInfo,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LemmatizeAll(children.head))
    reg.registerFunction(
      FunctionIdentifier("dot_product"), dotProductInfo,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(children(0), children(1)))
  }
}
