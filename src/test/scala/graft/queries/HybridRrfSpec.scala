package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** q127_hybrid_rrf: reciprocal-rank fusion of the BM25 and cosine legs.
  *
  * The leg rankings themselves are oracle-checked (and their scoring
  * chains have their own specs: Bm25Spec, the q42 oracle); this spec
  * pins the FUSION:
  *  1. hand-built leg tables through the production rrfFuse — overlap,
  *    single-leg items, the absent-leg-contributes-0 rule, integer
  *    contribution values, and the (rrf desc, doc_id) tie-break are all
  *    computed by hand;
  *  2. on the fixture output, every row's rrf_e6 must equal the plain-
  *    Scala recomputation from its own emitted ranks (no row can carry
  *    a fused score inconsistent with its rank columns).
  */
class HybridRrfSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def contrib(rank: Option[Long]): Long =
    rank.map(r => 1000000L / (60L + r)).getOrElse(0L)

  test("hand-built legs: overlap, single-leg items, ties, top-k order") {
    import spark.implicits._
    // lex ranks: doc 1 -> 1, doc 2 -> 2, doc 3 -> 3
    // sem ranks: doc 2 -> 1, doc 4 -> 2, doc 1 -> 3
    val lex = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "lex_rank")
    val sem = Seq((2L, 1L), (4L, 2L), (1L, 3L)).toDF("doc_id", "sem_rank")
    val got = Pipeline.rrfFuse(lex, sem)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3))).toSeq
    // by hand: 1e6 div 61 = 16393, div 62 = 16129, div 63 = 15873
    // doc 1: 16393 + 15873 = 32266 ; doc 2: 16129 + 16393 = 32522
    // doc 3: 15873 (lex only)      ; doc 4: 16129 (sem only)
    assert(got === Seq(
      (2L, Some(2L), Some(1L), 32522L),
      (1L, Some(1L), Some(3L), 32266L),
      (4L, None, Some(2L), 16129L),
      (3L, Some(3L), None, 15873L)))
  }

  test("rrf ties break on doc_id ascending") {
    import spark.implicits._
    val lex = Seq((7L, 1L), (9L, 2L)).toDF("doc_id", "lex_rank")
    val sem = Seq((9L, 1L), (7L, 2L)).toDF("doc_id", "sem_rank")
    val got = Pipeline.rrfFuse(lex, sem).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(7L, 9L)) // identical fused scores; id order decides
  }

  test("fixture output rows are self-consistent: rrf_e6 = f(lex_rank, sem_rank)") {
    val rows = SparkEntry.queries("q127_hybrid_rrf")(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val lex = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val sem = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(r.getLong(3) === contrib(lex) + contrib(sem),
        s"doc ${r.getLong(0)}: rrf ${r.getLong(3)} != ${contrib(lex) + contrib(sem)}")
    }
    // and the emitted order is (rrf desc, doc_id)
    val keys = rows.map(r => (-r.getLong(3), r.getLong(0))).toSeq
    assert(keys === keys.sorted)
  }
}
