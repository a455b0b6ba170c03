package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row 8×2 bigram-minhash band keys over a text column —
  * the SAME bytes as the declarative chain `bandKeys(nearDupState(_))`
  * (split on " ", bigram shingles joined by one space, per-shingle
  * md5("<salt>:" + shingle) with salts a–d, minhash component i = min
  * over shingles of hex window [8·(i%4), 8·(i%4)+8) parsed base-16,
  * band j = (h₂ⱼ, h₂ⱼ₊₁)) — parity is spec-pinned two-sided in
  * StateStoreNearDupSpec.
  *
  * Why native: the higher-order-function form (`transform` +
  * `array_min` lambdas) evaluates interpreted — measured 38 s vs this
  * expression's sub-second on the sf0.1 corpus (the ArrayDot lesson at
  * per-shingle rather than per-pair granularity). The hex windows are
  * read straight from the digest bytes (window k = digest bytes
  * [4k, 4k+4) as an unsigned 32-bit big-endian int), so no hex string
  * is ever materialized. Docs with fewer than 2 tokens yield NULL (no
  * shingles → no bands), matching the batch pipeline's size filter. */
case class MinHashBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("k0", LongType, nullable = false),
    StructField("k1", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any =
    MinHashBands.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.MinHashBands.compute($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_bands"
}

object MinHashBands {

  /** Null iff the text has fewer than 2 tokens. Called from generated
    * code — keep the signature stable. The minhash fold lives in
    * [[MinHashKernel.minhash]] (shared with [[MinHashSig]]); this
    * packs the 16 components into the 8 band structs. */
  def compute(text: UTF8String): ArrayData = {
    val mins = MinHashKernel.minhash(MinHashKernel.tokens(text), 2, 16)
    if (mins == null) return null
    val bands = new Array[Any](8)
    var j = 0
    while (j < 8) {
      bands(j) = InternalRow(mins(2 * j), mins(2 * j + 1))
      j += 1
    }
    new GenericArrayData(bands)
  }
}
