package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r10 item 4: the OPQ variance ranking key n·Σx²−(Σx)² is
  * int64-safe only to n ≈ 2100 at worst-case post-rotation magnitude
  * |x| ≤ √2·10⁶. Past [[Vectors.VarKeySafeN]] both engines switch to
  * the centi-scaled floor key. This spec builds the adversarial corpus
  * the bound is about — worst-case magnitudes, n past the boundary —
  * and pins (a) the exact key WOULD wrap there, (b) the scaled key the
  * engine computes equals a BigInt reference (no wrap), (c) ranking is
  * preserved, (d) the floor-division semantics match DuckDB's `//` on
  * negatives, (e) the exact path still serves n ≤ VarKeySafeN. */
class OpqVarianceKeySpec extends AnyFunSuite with SparkTestSession {

  private val MaxMag = 1414214L // ⌈√2·10⁶⌉ — the post-rotation bound

  /** n rows, 4 dims; dim j at magnitude scaled by (j+1)/4 with
    * alternating sign, so per-dim variances are distinct and Σx ≈ 0
    * (the exact key's worst case). */
  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, (0 until 4).map(j =>
        (if ((i + j) % 2 == 0) 1L else -1L) * (MaxMag * (j + 1) / 4)).toArray)
    }.toDF("vec_id", "xi")
  }

  private def bigIntKeys(rows: Seq[Array[Long]],
      scale: Long => BigInt): Map[Int, BigInt] =
    (0 until 4).map { j =>
      val xs = rows.map(r => scale(r(j)))
      val n = BigInt(xs.size)
      j -> (n * xs.map(x => x * x).sum - xs.sum * xs.sum)
    }.toMap

  test("past VarKeySafeN the scaled key engages, never wraps, and preserves ranking") {
    val n = 2200 // past the ~2100 int64 bound at worst-case magnitude
    assert(n > Vectors.VarKeySafeN)
    val df = corpus(n).localCheckpoint(true)
    val rows = df.collect().map(_.getSeq[Long](1).toArray).toSeq

    // (a) the EXACT key genuinely overflows here — the remedy is
    // load-bearing, not hypothetical
    val exact = bigIntKeys(rows, x => BigInt(x))
    assert(exact.values.exists(_ > BigInt(Long.MaxValue)),
      s"fixture does not overflow the exact key: max=${exact.values.max}")

    // (b) engine key == BigInt reference of the SAME scaled values
    val got = Vectors.varianceKeys(df, n).toMap
    val ref = bigIntKeys(rows, x => BigInt(Math.floorDiv(x, 100L)))
    assert(ref.values.forall(v => v.isValidLong),
      "scaled reference itself overflows — fixture broken")
    for (j <- 0 until 4)
      assert(BigInt(got(j)) == ref(j), s"dim $j: got ${got(j)}, want ${ref(j)}")

    // (c) ranking (the thing the deal consumes) matches the exact
    // key's ranking — scaling preserved order on this corpus
    val rankGot = got.toSeq.sortBy { case (dd, vk) => (-vk, dd) }.map(_._1)
    val rankExact = exact.toSeq.sortBy { case (dd, vk) => (-vk, dd) }.map(_._1)
    assert(rankGot == rankExact)
  }

  test("floor division matches DuckDB's // on negatives") {
    // DuckDB `x // 100` floors; Spark `div` truncates toward zero —
    // varianceKeys must use floor(x/100.0) so -250 maps to -3, not -2
    import spark.implicits._
    val df = Seq((0L, Array(-250L, 250L, -100L, 199L))).toDF("vec_id", "xi")
    val got = Vectors.varianceKeys(df, Vectors.VarKeySafeN + 1).toMap
    // n=1 ⇒ key = 1·xs² − xs² = 0 — instead derive xs via the key of a
    // 2-row corpus: key = 2(a²+b²) − (a+b)² = (a−b)²
    val df2 = Seq(
      (0L, Array(-250L, -250L, -250L, -250L)),
      (1L, Array(100L, 0L, -100L, 50L))).toDF("vec_id", "xi")
    val keys = Vectors.varianceKeys(df2, Vectors.VarKeySafeN + 1).toMap
    def sq(x: Long) = x * x
    assert(keys(0) == sq(Math.floorDiv(-250L, 100L) - 1L)) // (-3 − 1)² = 16
    assert(keys(2) == sq(-3L - -1L)) // floor(-100/100) = -1
    assert(got.values.forall(_ == 0L)) // single row ⇒ zero variance
  }

  test("at or under VarKeySafeN the exact key is served unchanged") {
    val n = 64
    val df = corpus(n).localCheckpoint(true)
    val rows = df.collect().map(_.getSeq[Long](1).toArray).toSeq
    val got = Vectors.varianceKeys(df, n).toMap
    val exact = bigIntKeys(rows, x => BigInt(x))
    for (j <- 0 until 4)
      assert(BigInt(got(j)) == exact(j), s"dim $j")
  }
}
