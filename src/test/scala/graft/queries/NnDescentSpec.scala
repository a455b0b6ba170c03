package graft.queries

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q113 NN-Descent: the refinement loop must actually converge toward
  * the true k-NN graph. Ground truth is a driver-side brute-force
  * top-K per node (exact doubles, no Spark); recall@K is measured for
  * the seeded random graph (round 0) and after each co-neighbor round.
  * Pinned: recall never DECREASES round over round, the first round
  * must deliver a real jump over the random baseline, and the entry's
  * three rounds at search breadth 16 must reach ≥ 0.93 (measured
  * 0.965 at spec-pin time; floor left slack for fixture
  * regeneration). */
class NnDescentSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"
  private val K = 6

  test("recall vs brute climbs monotonically and converges") {
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val unit = vecs.map { case (id, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      id -> v.map(_ / n)
    }
    // brute top-K per node, (sim desc, id asc) — the q113 tie order
    val truth: Map[Long, Set[Long]] = unit.map { case (i, u) =>
      val scored = unit.filter(_._1 != i).map { case (j, w) =>
        val dotp = u.zip(w).map { case (a, b) => a * b }.sum
        (math.floor(dotp * 10000 + 0.5) / 10000, j)
      }
      i -> scored.sortBy { case (s, j) => (-s, j) }.take(K).map(_._2).toSet
    }.toMap

    def recall(rounds: Int): Double = {
      val got = Vectors.nnDescentGraph(spark, dir, rounds, searchK = 16)
        .where(col("rnk") <= K)
        .select(col("src"), col("dst")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (s, a) => s -> a.map(_._2).toSet }
      val hits = truth.toSeq.map { case (i, t) =>
        (t intersect got.getOrElse(i, Set.empty)).size
      }.sum
      hits.toDouble / (truth.size * K)
    }

    val r0 = recall(0)
    val r1 = recall(1)
    val r2 = recall(2)
    val r3 = recall(3)
    info(f"recall@$K: seeded=$r0%.3f r1=$r1%.3f r2=$r2%.3f r3=$r3%.3f")
    assert(r0 < 0.3, s"random-seeded baseline suspiciously high ($r0) — test is vacuous")
    assert(r1 >= r0 + 0.2, s"first co-neighbor round did not jump: $r0 -> $r1")
    assert(r2 >= r1 && r3 >= r2, s"recall regressed round over round: $r1 -> $r2 -> $r3")
    assert(r3 >= 0.93, s"converged recall too low: $r3")
  }

  test("q114 beam search over the graph finds the true top-3") {
    // brute top-3 per query (exact doubles, driver-side), the q48
    // convention: queries are vec_ids 1..5, self excluded
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
    val got = graft.SparkEntry.queries("q114_graph_ann_search")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val hits = truth.toSeq.map { case (q, t) =>
      (t intersect got.getOrElse(q, Set.empty)).size
    }.sum
    info(s"beam-search recall@3: $hits/15")
    // measured 15/15 at spec-pin time; the floor tolerates one miss
    // after a fixture regeneration, not a broken walk
    assert(hits >= 12, s"beam search missed too many true neighbors: $hits/15")
  }
}
