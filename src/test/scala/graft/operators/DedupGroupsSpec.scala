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
}
