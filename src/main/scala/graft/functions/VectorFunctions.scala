package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Vector math over `array<double>` columns, backed by the native
  * codegen [[ArrayDot]] expression (a custom Catalyst `Expression` with
  * `doGenCode` — SURVEY.md §4.2's "cosine/dot/L2" custom piece; ~30×
  * over the interpreted higher-order-function formulation on all-pairs
  * workloads).
  *
  * All callers cast elements to DOUBLE first ([[vecDouble]]); fixture
  * embeddings are float32 and mixed-precision arithmetic would not
  * hash-match the oracle (SURVEY.md §7.3).
  */
object VectorFunctions {

  /** Element-wise cast to double. */
  def vecDouble(a: Column): Column = transform(a, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))
}
