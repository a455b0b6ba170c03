package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Min-label propagation on known graph shapes: a chain (worst-case
  * diameter), a triangle (cycle), and an isolated pair. */
class DedupGroupsSpec extends AnyFunSuite with SparkTestSession {

  test("components of a chain, a triangle, and a pair") {
    import spark.implicits._
    // chain 1-2-3-4, triangle 10-11, 11-12, 10-12, pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val labels = DedupGroups.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("propagation converges across a long chain (diameter > 2)") {
    import spark.implicits._
    val n = 12
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("doc_a", "doc_b")
    val labels = DedupGroups.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n)
    assert(labels.values.forall(_ == 1L), labels.toString)
  }

  test("large-star/small-star solves a path graph far beyond min-label's round budget") {
    // diameter-200 path: min-label propagation would need ~200 rounds
    // (components() caps at 20 and would return un-converged labels);
    // star contraction must finish within its default logarithmic budget
    import spark.implicits._
    val n = 200
    // shuffled node ids so the path isn't id-ordered (ordered ids make
    // min-label artificially easy and would mask directional bugs)
    val perm = new scala.util.Random(7).shuffle((0 until n).toVector)
    val pairs = (1 until n).map(i => (perm(i - 1).toLong, perm(i).toLong))
      .toDF("doc_a", "doc_b")
    val labels = DedupGroups.componentsStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n)
    assert(labels.values.forall(_ == 0L),
      s"labels not all 0: ${labels.filter(_._2 != 0L).take(5)}")
  }

  test("star variant equals min-label on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val nNodes = 60
      val nEdges = 50 + rnd.nextInt(40)
      val pairs = (0 until nEdges).map { _ =>
        val a = rnd.nextInt(nNodes).toLong
        val b = rnd.nextInt(nNodes).toLong
        (a, if (a == b) (b + 1) % nNodes else b)
      }.toDF("doc_a", "doc_b")
      def toMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val minLabel = toMap(DedupGroups.components(pairs))
      val star = toMap(DedupGroups.componentsStar(pairs))
      assert(star == minLabel, s"trial $trial: star/min-label disagree")
    }
  }
}
