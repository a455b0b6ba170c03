package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared per-row kernel behind the zero-shuffle near-dup state build:
  * tokenization, word-n-gram shingling, the salted-md5 minhash fold and
  * the xxhash64 shingle-set fold — each the SAME bytes as the
  * declarative explode/group-by chain it replaces (split on " ",
  * shingles joined by one space, md5("<salt>:"+shingle) hex windows,
  * `xxhash64` = XXH64 seed 42), parity spec-pinned
  * (NativeStateSpec). */
object MinHashKernel {

  // 8 salts × 4 hex windows = up to 32 components; the first 16 (salts
  // a:–d:) are the classic near-dup signature, 17–32 (e:–h:) exist for
  // the signature-WIDENING migration (IncrementalNearDup.widenMigrate)
  // — same generator as the declarative/oracle recipe's
  // ('a' + i/4) salt rule
  private val Salts: Array[Array[Byte]] =
    Array("a:", "b:", "c:", "d:", "e:", "f:", "g:", "h:").map(_.getBytes(UTF_8))

  private val Md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def tokens(text: UTF8String): Array[String] = text.toString.split(" ", -1)

  private def shingle(tokens: Array[String], i: Int, n: Int): String =
    if (n == 2) tokens(i) + " " + tokens(i + 1)
    else {
      val sb = new java.lang.StringBuilder(tokens(i))
      var k = 1
      while (k < n) { sb.append(' ').append(tokens(i + k)); k += 1 }
      sb.toString
    }

  /** The `nHashes` minhash components (min over shingles of md5 hex
    * window (i%4) under salt (i/4)); null if fewer than `n` tokens. */
  def minhash(tokens: Array[String], n: Int, nHashes: Int): Array[Long] =
    minhashRange(tokens, n, 0, nHashes)

  /** Components [from, until) of the salted-md5 minhash family — the
    * widening migration's corpus pass computes ONLY the new components
    * (from = 16, until = 32), paying md5 for salts e:–h: and nothing
    * for the 16 the state already stores. Output array has
    * `until − from` entries; null if fewer than `n` tokens. */
  def minhashRange(tokens: Array[String], n: Int, from: Int, until: Int): Array[Long] = {
    val nTok = tokens.length
    if (nTok < n) return null
    val s0 = from / 4
    val nSalts = (until + 3) / 4
    val mins = Array.fill(until - from)(Long.MaxValue)
    val digest = Md.get()
    var i = 0
    while (i <= nTok - n) {
      val sh = shingle(tokens, i, n).getBytes(UTF_8)
      var s = s0
      while (s < nSalts) {
        digest.reset()
        digest.update(Salts(s))
        digest.update(sh)
        val d = digest.digest()
        var k = 0
        while (k < 4) {
          val idx = s * 4 + k
          if (idx >= from && idx < until) {
            val v = ((d(4 * k) & 0xffL) << 24) | ((d(4 * k + 1) & 0xffL) << 16) |
              ((d(4 * k + 2) & 0xffL) << 8) | (d(4 * k + 3) & 0xffL)
            if (v < mins(idx - from)) mins(idx - from) = v
          }
          k += 1
        }
        s += 1
      }
      i += 1
    }
    mins
  }

  /** Sorted distinct xxhash64 (seed 42 — Spark's `xxhash64`) of the
    * shingle strings; null if fewer than `n` tokens. */
  def shingleSet(tokens: Array[String], n: Int): Array[Long] = {
    val nTok = tokens.length
    if (nTok < n) return null
    val hs = new Array[Long](nTok - n + 1)
    var i = 0
    while (i <= nTok - n) {
      hs(i) = XXH64.hashUTF8String(
        UTF8String.fromString(shingle(tokens, i, n)), 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedupe of the sorted array
    var w = 0
    var r = 1
    while (r < hs.length) {
      if (hs(r) != hs(w)) { w += 1; hs(w) = hs(r) }
      r += 1
    }
    if (w + 1 == hs.length) hs else java.util.Arrays.copyOf(hs, w + 1)
  }
}

/** Per-row `nHashes`-component word-`n`-gram minhash signature as
  * `array<long>` — the zero-shuffle signature side of the near-dup
  * state (see [[MinHashKernel]]). NULL for docs with fewer than `n`
  * tokens, matching the declarative chain's size filter.
  * `firstHash` offsets into the salted-md5 family: components
  * [firstHash, firstHash + nHashes) — the signature-widening
  * migration's corpus pass sets firstHash = 16 to compute only the new
  * half (salts e:–h:), never re-paying md5 for the stored 16. */
case class MinHashSig(child: Expression, n: Int, nHashes: Int,
    firstHash: Int = 0) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 && nHashes >= 1 && firstHash >= 0 &&
        firstHash + nHashes <= 32 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument and 1<=nHashes, firstHash+nHashes<=32, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any = {
    val mins = MinHashKernel.minhashRange(
      MinHashKernel.tokens(t.asInstanceOf[UTF8String]), n, firstHash,
      firstHash + nHashes)
    if (mins == null) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      s"""
         |long[] $mins = graft.functions.MinHashKernel.minhashRange(
         |  graft.functions.MinHashKernel.tokens($c), $n, $firstHash,
         |  ${firstHash + nHashes});
         |${ev.isNull} = $mins == null;
         |${ev.value} = ${ev.isNull} ? null :
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** Per-row sorted distinct xxhash64 shingle set as `array<long>` — the
  * zero-shuffle exact-verify side of the near-dup state (see
  * [[MinHashKernel]]). NULL for docs with fewer than `n` tokens. */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any = {
    val hs = MinHashKernel.shingleSet(
      MinHashKernel.tokens(t.asInstanceOf[UTF8String]), n)
    if (hs == null) null else new GenericArrayData(hs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val hs = ctx.freshName("hs")
      s"""
         |long[] $hs = graft.functions.MinHashKernel.shingleSet(
         |  graft.functions.MinHashKernel.tokens($c), $n);
         |${ev.isNull} = $hs == null;
         |${ev.value} = ${ev.isNull} ? null :
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($hs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_set"
}
