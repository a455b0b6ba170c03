package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` columns built from codegen'd built-in
  * higher-order functions (`zip_with`/`aggregate`) — no UDF, stays inside
  * whole-stage codegen (SURVEY.md §4.2: custom piece "cosine/dot/L2").
  *
  * All helpers cast elements to DOUBLE first; fixture embeddings are
  * float32 and mixed-precision arithmetic would not hash-match the
  * oracle (SURVEY.md §7.3).
  */
object VectorFunctions {

  /** Element-wise cast to double. */
  def vecDouble(a: Column): Column = transform(a, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))
}
