package graft.queries

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q116b's rotation stage, held to its determinism and geometry
  * claims:
  *
  *  1. BIT-FOR-BIT driver replay: plain-Scala arithmetic (quantize →
  *     integer variances → rank/pair → one IEEE multiply by the shared
  *     Givens literal → half-up floor) reproduces the engine's rotated
  *     relation exactly — the cross-engine determinism argument made
  *     executable (the oracle gate then shows DuckDB agrees too).
  *  2. Orthogonality up to quantization: a 45° Givens pass preserves
  *     each row's squared norm; re-quantization perturbs each
  *     component by ≤ 0.5, so Σx'² must stay within a small relative
  *     bound of Σx².
  *  3. Variance balancing — the point of the rotation: the max/min
  *     per-dimension variance ratio must SHRINK vs the unrotated
  *     vectors (a permutation can reorder variances but never change
  *     this ratio; only a real rotation can).
  */
class OpqRotationSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"
  private val C = 0.7071067811865476

  private def quantized: Map[Long, Array[Long]] =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)
        .map(v => math.floor(v * 1000000 + 0.5).toLong).toArray)
      .toMap

  private def varKeys(m: Map[Long, Array[Long]]): Array[Long] = {
    val n = m.size.toLong
    (0 until 64).map { dd =>
      val xs = m.values.map(_(dd))
      n * xs.map(x => x * x).sum - { val s = xs.sum; s * s }
    }.toArray
  }

  test("engine rotation replays bit-for-bit in plain Scala") {
    val base = quantized
    val vk = varKeys(base)
    val ranked = (0 until 64).sortBy(dd => (-vk(dd), dd))
    val pairs = (0 until 32).map(i => (ranked(i), ranked(63 - i)))
    val expectRot: Map[Long, Array[Long]] = base.map { case (id, x) =>
      val out = new Array[Long](64)
      pairs.foreach { case (h, l) =>
        out(h) = math.floor((x(h).toDouble - x(l).toDouble) * C + 0.5).toLong
        out(l) = math.floor((x(h).toDouble + x(l).toDouble) * C + 0.5).toLong
      }
      id -> out
    }

    val (enginePairs, rvecs) = Vectors.opqRotationStage(spark, dir)
    assert(enginePairs == pairs, "pair schedule diverges from replay")
    val got = rvecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    assert(got.keySet == expectRot.keySet)
    for (id <- got.keySet)
      assert(got(id).sameElements(expectRot(id)),
        s"rotated vector $id diverges: got=${got(id).take(6).mkString(",")} " +
          s"want=${expectRot(id).take(6).mkString(",")}")
  }

  test("rotation preserves squared norms up to quantization") {
    val (_, rvecs) = Vectors.opqRotationStage(spark, dir)
    val base = quantized
    val got = rvecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    for ((id, x) <- base) {
      val n0 = x.map(v => v.toDouble * v).sum
      val n1 = got(id).map(v => v.toDouble * v).sum
      assert(math.abs(n1 - n0) <= 1e-4 * n0 + 1e6,
        s"norm drifted for $id: $n0 -> $n1")
    }
  }

  test("rotation shrinks the max/min dimension-variance ratio (what a permutation cannot do)") {
    val base = quantized
    val (_, rvecs) = Vectors.opqRotationStage(spark, dir)
    val rot = rvecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def ratio(m: Map[Long, Array[Long]]): Double = {
      val vk = varKeys(m).map(_.toDouble)
      vk.max / vk.min
    }
    val (r0, r1) = (ratio(base), ratio(rot))
    assert(r1 < r0, s"variance ratio did not shrink: $r0 -> $r1")
  }
}
