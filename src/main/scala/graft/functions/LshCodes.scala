package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native per-row hyperplane-LSH band codes over an `array<float>`
  * embedding — the SAME integers as the declarative chain in
  * `Vectors.lshCandidatePairs` (quantize each component once as
  * `floor(x·10⁶ + 0.5)` in double, per-plane signed sum with ±1
  * md5-parity weights `md5("p:d")` first-hex-nibble-odd → +1, then
  * pack plane p's sign bit into band `p div bits` at bit `p % bits`).
  * All-integer after the one quantization, so the packing is
  * order-independent and matches the old `explode → join(planes) →
  * groupBy(vec_id, p) → groupBy(vec_id, band)` chain bit-for-bit
  * (parity is spec-pinned by LshCodesSpec, which replays the
  * DataFrame chain verbatim).
  *
  * Why native (the MinHashBands lesson on the vector side): the chain
  * form explodes n×64 component rows and joins them against 8·bits
  * planes — an O(n · 64 · 8·bits) shuffled intermediate (~700M rows at
  * 100k vectors / 14 bits) for what is a per-row pure function. This
  * expression computes all 8 codes in one compiled pass over the 64
  * floats: the LSH code build becomes a MAP-ONLY corpus scan at any
  * scale, which is the 100 TB shape — no shuffle until the bucket
  * join itself. The plane-weight table is a process-wide constant per
  * width (md5 of 8·bits × 64 fixed strings), computed once and
  * cached.
  *
  * `bits` is the corpus-linked code width (`Vectors.lshBandBits` —
  * log₂ n − 3, floor 8); it arrives as a constructor parameter
  * because it is derived from a bounded count on the driver before
  * the plan is built. */
case class LshCodes(child: Expression, bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    LshCodes.compute(a.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.LshCodes.compute($c, $bits);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "lsh_codes"
}

object LshCodes {

  /** Hyperplane dimensionality — fixture embeddings are 64-wide, and
    * the declarative chain's plane relation only ever carried dims
    * 0..63 (a longer vector's tail dims fell out of its join). */
  val Dims = 64

  // ±1 weight tables keyed by plane count — md5 of fixed strings, a
  // process-wide constant per code width
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]

  private def weights(nPlanes: Int): Array[Array[Byte]] =
    cache.computeIfAbsent(nPlanes, _ => {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(nPlanes) { p =>
        Array.tabulate(Dims) { d =>
          md.reset()
          val digest = md.digest(s"$p:$d".getBytes("UTF-8"))
          val firstHexNibble = (digest(0) >> 4) & 0xf
          if (firstHexNibble % 2 == 1) 1.toByte else (-1).toByte
        }
      }
    })

  /** Called from generated code — keep the signature stable. Returns
    * the 8 band codes (band b at index b). */
  def compute(arr: ArrayData, bits: Int): ArrayData = {
    val n = math.min(arr.numElements(), Dims)
    val xi = new Array[Long](n)
    var d = 0
    while (d < n) {
      xi(d) = math.floor(arr.getFloat(d).toDouble * 1000000.0 + 0.5).toLong
      d += 1
    }
    val nPlanes = 8 * bits
    val w = weights(nPlanes)
    val codes = new Array[Long](8)
    var p = 0
    while (p < nPlanes) {
      val wp = w(p)
      var sgn = 0L
      var i = 0
      while (i < n) { sgn += wp(i) * xi(i); i += 1 }
      if (sgn >= 0) codes(p / bits) |= 1L << (p % bits)
      p += 1
    }
    new GenericArrayData(codes)
  }
}
