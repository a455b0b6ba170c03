package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row LSH band BUCKET ids over a text column, at any
  * (nBands × bandR) banding of the bigram-minhash signature — the
  * stateless prefix of the continuous-plan near-dup pipelines (qc8 /
  * qc10) and the parameterization that lets the RocksDB state-store
  * index run the same designs the parquet twin migrates between
  * ((8, 2) default, (4, 4) re-band, (8, 4) over the widened 32-wide
  * family — VERDICT r11 item 1).
  *
  * Bucket id of band j = Spark's `xxhash64` (XXH64 seed 42, longs
  * folded in argument order) over the band's `bandR` consecutive
  * minhash components — byte-identical to
  * `xxhash64(key.k0, …, key.k{r-1})` over [[graft.queries.LlmText
  * .bandKeys]]'s structs, parity spec-pinned two-sided in
  * StateStoreNearDupSpec. Hashing the key tuple to ONE long makes the
  * state-store key shape design-independent: the store keys on
  * (band, bucket) whatever the band width. A 64-bit collision merges
  * two buckets; the only effects are a spurious candidate pair (killed
  * by the downstream exact verify — results unchanged) and the merged
  * membership counting jointly toward the hot cap (probability ~2⁻⁶⁴
  * per bucket pair — documented, not load-bearing).
  *
  * The minhash components are the SAME bytes as the declarative chain
  * over [[graft.functions.MinHashSig]] (split on " ", bigram shingles
  * joined by one space, per-shingle md5("<salt>:" + shingle) with the
  * ('a' + i/4) salt generator, component i = min over shingles of hex
  * window [8·(i%4), 8·(i%4)+8) parsed base-16) — the shared
  * [[MinHashKernel]] fold, no hex string ever materialized.
  *
  * Why native: the higher-order-function form (`transform` +
  * `array_min` lambdas) evaluates interpreted — measured 38 s vs this
  * expression's sub-second on the sf0.1 corpus (the ArrayDot lesson at
  * per-shingle granularity). Docs with fewer than 2 tokens yield NULL
  * (no shingles → no bands), matching the batch pipeline's size
  * filter. */
case class MinHashBands(child: Expression, nBands: Int, bandR: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any =
    MinHashBands.compute(t.asInstanceOf[UTF8String], nBands, bandR)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.MinHashBands.compute($c, $nBands, $bandR);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_band_buckets"
}

object MinHashBands {

  /** Null iff the text has fewer than 2 tokens. Called from generated
    * code — keep the signature stable. The minhash fold lives in
    * [[MinHashKernel.minhash]] (shared with [[MinHashSig]]); this folds
    * each band's `bandR` components through XXH64 exactly as Spark's
    * `xxhash64` builtin does (seed 42, then hashLong per argument). */
  def compute(text: UTF8String, nBands: Int, bandR: Int): ArrayData = {
    val mins = MinHashKernel.minhash(MinHashKernel.tokens(text), 2, nBands * bandR)
    if (mins == null) return null
    val buckets = new Array[Any](nBands)
    var j = 0
    while (j < nBands) {
      var h = 42L
      var k = 0
      while (k < bandR) {
        h = XXH64.hashLong(mins(bandR * j + k), h)
        k += 1
      }
      buckets(j) = h
      j += 1
    }
    new GenericArrayData(buckets)
  }
}
