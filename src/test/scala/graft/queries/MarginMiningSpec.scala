package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q115 margin-based pair mining: a driver-side replay recomputes the
  * whole miner (candidate-restricted top-4 normalizers, integer-e4
  * margins, mutual-best, threshold) from the COLLECTED candidate pairs
  * with plain Scala — the third-implementation doctrine — and the
  * margin must be shown to do real work beyond mutual-best filtering
  * (at least one mutual-best pair rejected for insufficient margin,
  * the hub-suppression claim). */
class MarginMiningSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("q115 replays exactly from collected candidates, margin is load-bearing") {
    val unit = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
      .collect()
      .map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        (r.getLong(0), v.map(_ / n), r.getInt(2) % 2)
      }
    val byId = unit.map(t => t._1 -> t).toMap

    val cand = Vectors.lshCandidatePairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => byId(a)._3 != byId(b)._3 }

    def simE4(a: Long, b: Long): Long = {
      val d = byId(a)._2.zip(byId(b)._2).map { case (x, y) => x * y }.sum
      math.floor(math.floor(d * 10000 + 0.5) / 10000 * 10000 + 0.5).toLong
    }
    val scored = cand.map { case (a, b) => (a, b, simE4(a, b)) }
    val dirr = scored.flatMap { case (a, b, s) => Seq((a, b, s), (b, a, s)) }
    val stats = dirr.groupBy(_._1).map { case (n, rows) =>
      val top = rows.sortBy { case (_, o, s) => (-s, o) }.take(4)
      n -> (top.map(_._3).sum, top.size.toLong)
    }
    val marg = dirr.flatMap { case (n, o, s) =>
      val (suma, cnta) = stats(n)
      val (sumb, cntb) = stats(o)
      val den = suma * cntb + sumb * cnta
      if (den <= 0) None
      else Some((n, o, math.floor(2.0 * s * cnta * cntb * 10000.0 / den + 0.5).toLong))
    }
    val best = marg.groupBy(_._1).map { case (n, rows) =>
      n -> rows.sortBy { case (_, o, m) => (-m, o) }.head
    }
    val mutual = best.values.filter { case (n, o, _) =>
      best.get(o).exists(b => b._2 == n) && n < o
    }.map { case (n, o, m) => (n, o, m) }.toSet
    val expect = mutual.filter(_._3 >= 10200L)

    val got = SparkEntry.queries("q115_margin_pair_mining")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect,
      s"replay mismatch: spark-only=${(got -- expect).take(3)} replay-only=${(expect -- got).take(3)}")
    assert(expect.nonEmpty, "no mined pairs — threshold or fixture drifted, test vacuous")
    // the margin clause must reject at least one mutual-best pair:
    // otherwise the criterion degenerates to mutual-argmax and the
    // density normalization is dead code on this fixture
    assert(mutual.exists(_._3 < 10200L),
      s"every mutual-best pair cleared the margin (${mutual.size} pairs) — margin not load-bearing")
  }
}
