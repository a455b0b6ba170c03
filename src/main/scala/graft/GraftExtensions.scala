package graft

import graft.functions.{ArrayDot, SortedArrayIntersectCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions exposing graft's native pieces:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  *   spark.sql("SELECT vec_dot(a, b) FROM pairs")
  * }}}
  *
  *  - SQL function `vec_dot` (the codegen [[ArrayDot]] expression; the
  *    Column API in [[graft.functions.VectorFunctions]] builds it
  *    directly and needs no registration);
  *  - [[graft.plans.AsOfRewriteRule]], rewriting the union+window as-of
  *    idiom to the native merge operator (disable with
  *    `spark.graft.asofRewrite.enabled=false`);
  *  - [[graft.plans.AsOfJoinStrategy]], planning
  *    [[graft.plans.AsOfJoinPlan]] into the physical merge exec.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedArrayIntersectCount].getName, "sorted_intersect_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedArrayIntersectCount(children(0), children(1))))
    ext.injectPostHocResolutionRule(_ => graft.plans.AsOfRewriteRule)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
