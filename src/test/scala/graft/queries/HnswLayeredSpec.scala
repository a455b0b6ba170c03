package graft.queries

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q128: the layered (HNSW-style) navigable search. Pinned:
  *  - recall@3 vs driver-side brute ground truth is ≥ the q114 floor
  *    (the hierarchy exists to give BETTER entries, never worse);
  *  - the md5 level assignment is nested (L2 ⊆ L1) and geometric-ish
  *    in size;
  *  - every upper-layer graph edge connects two members of its layer
  *    (the navigable-subgraph invariant greedy descent relies on).
  */
class HnswLayeredSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def memberSet(modulus: Int): Set[Long] =
    Tables(spark, dir, "embeddings").select(col("vec_id"))
      .where(pmod(conv(substring(md5(concat(lit("lvl#"), col("vec_id"))), 1, 8), 16, 10)
        .cast("long"), lit(modulus)) === 0)
      .collect().map(_.getLong(0)).toSet

  test("layered search recall@3 >= the q114 floor") {
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val unit = vecs.map { case (id, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      id -> v.map(_ / n)
    }
    val truth = (1L to 5L).map { q =>
      val qu = unit.find(_._1 == q).get._2
      val top = unit.filter(_._1 != q).map { case (j, w) =>
        (math.floor(qu.zip(w).map { case (a, b) => a * b }.sum * 10000 + 0.5) / 10000, j)
      }.sortBy { case (sim, j) => (-sim, j) }.take(3).map(_._2).toSet
      q -> top
    }.toMap
    def hits(q: String): Int = {
      val got = graft.SparkEntry.queries(q)(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (k, a) => k -> a.map(_._2).toSet }
      truth.toSeq.map { case (k, t) => (t intersect got.getOrElse(k, Set.empty)).size }.sum
    }
    val flat = hits("q114_graph_ann_search")
    val layered = hits("q128_hnsw_layered_search")
    info(s"recall@3: q114=$flat/15 q128=$layered/15")
    assert(layered >= flat, s"hierarchy must not lose recall: q128=$layered < q114=$flat")
    assert(layered >= 12, s"layered search missed too many true neighbors: $layered/15")
  }

  test("md5 levels are nested and geometric-ish") {
    val l1 = memberSet(4)
    val l2 = memberSet(16)
    val n = Tables(spark, dir, "embeddings").count()
    assert(l2.subsetOf(l1), "L2 must be a subset of L1 (nested levels)")
    assert(l1.size > n / 8 && l1.size < n / 2, s"L1 size off-geometric: ${l1.size}/$n")
    assert(l2.size > n / 32 && l2.size < n / 8, s"L2 size off-geometric: ${l2.size}/$n")
    assert(l2.nonEmpty, "L2 must be non-empty for the entry descent")
  }

  test("upper-layer graphs connect only members of their layer") {
    Seq((4, "L1"), (16, "L2")).foreach { case (m, tag) =>
      val members = memberSet(m)
      val edges = Vectors.hnswLayerGraphShared(spark, dir, m, tag)
        .select(col("src"), col("dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(edges.nonEmpty, s"$tag graph is empty")
      val bad = edges.filterNot { case (s, t) => members(s) && members(t) }
      assert(bad.isEmpty, s"$tag graph leaves its layer: ${bad.take(5).toSeq}")
    }
  }
}
