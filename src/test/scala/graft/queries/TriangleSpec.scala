package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** q99's compact-forward triangle census must count exactly the
  * triangles of the q54 near-dup graph — orientation changes the WORK,
  * never the result. The fixture graph is small enough to brute-force
  * on the driver, so this pins the distributed algorithm (orientation,
  * wedge pairing, closure join) against naive enumeration.
  */
class TriangleSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("q99 per-node triangle counts match driver-side brute force over q54 pairs") {
    val pairs = SparkEntry.queries("q54_banded_neardup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2))
    def adjacent(a: Long, b: Long): Boolean =
      pairs.contains((math.min(a, b), math.max(a, b)))
    val brute = nodes.map { n =>
      val nbrs = nodes.filter(m => m != n && adjacent(n, m)).toSeq.sorted
      val tris = nbrs.combinations(2).count { case Seq(x, y) => adjacent(x, y) }
      n -> (nbrs.size.toLong, tris.toLong)
    }.toMap

    val got = SparkEntry.queries("q99_neardup_triangles")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == brute.keySet,
      s"node set mismatch: missing=${(brute.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- brute.keySet).take(5)}")
    for ((n, (deg, tris)) <- brute) {
      assert(got(n) == ((deg, tris)), s"node $n: got ${got(n)}, brute ($deg, $tris)")
    }
    val total = brute.valuesIterator.map(_._2).sum / 3
    info(s"graph: ${nodes.size} nodes, ${pairs.size} edges, $total triangles")
  }
}
