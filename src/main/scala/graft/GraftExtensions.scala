package graft

import graft.functions.ArrayDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions exposing graft's native expressions to SQL:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  *   spark.sql("SELECT vec_dot(a, b) FROM pairs")
  * }}}
  *
  * The Column API ([[graft.functions.VectorFunctions]]) builds the same
  * expressions directly and needs no registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayDot(children(0), children(1))))
  }
}
