package graft.functions

import graft.expr.{CompressVector, DotProduct, Lemmatize, LemmatizeAll, VectorDot}
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.Shim

/** Column-API entry points for the engine's native Catalyst expressions. */
object GraftFunctions {

  def lemmatize(c: Column): Column =
    Shim.column(Lemmatize(Shim.expression(c)))

  def lemmatize_all(c: Column): Column =
    Shim.column(LemmatizeAll(Shim.expression(c)))

  def dot_product(a: Column, b: Column): Column =
    Shim.column(DotProduct(Shim.expression(a), Shim.expression(b)))

  def compress_vector(c: Column): Column =
    Shim.column(CompressVector(Shim.expression(c)))

  def vector_dot(a: Column, b: Column): Column =
    Shim.column(VectorDot(Shim.expression(a), Shim.expression(b)))
}
