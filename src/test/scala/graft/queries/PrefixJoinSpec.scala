package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** q46b (AllPairs/PPJoin prefix-filtered exact Jaccard at 0.7) claims
  * to be a LOSSLESS plan rewrite: exactly q46's all-pairs result
  * restricted to >= 0.7, containing every >= 0.7 pair q54's approximate
  * banding surfaces, with candidate generation bounded by shared prefix
  * tokens instead of n². These specs pin all three relations —
  * exactness, domination of the banded form at the shared threshold,
  * and real candidate-space shrinkage.
  */
class PrefixJoinSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Map[(Long, Long), Double] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("q46b equals q46 restricted to >= 0.7 — prefix filtering is lossless") {
    val brute = rows("q46_ngram_jaccard").filter(_._2 >= 0.7)
    val prefix = rows("q46b_jaccard_prefix_join")
    assert(brute.nonEmpty, "fixture should produce >= 0.7 jaccard pairs")
    assert(prefix == brute,
      s"prefix-join diverged from all-pairs: missing=${(brute.keySet -- prefix.keySet).take(5)} " +
        s"extra=${(prefix.keySet -- brute.keySet).take(5)}")
  }

  test("q46b dominates q54 at the shared threshold: every banded pair scoring >= 0.7 appears, with the same score") {
    // q54's MinHash banding can miss a qualifying pair (recall < 1 by
    // design); the lossless form may never — and scores must agree
    // because both verify with the same exact kernel
    val exact = rows("q46b_jaccard_prefix_join")
    val banded = rows("q54_banded_neardup").filter(_._2 >= 0.7)
    assert(banded.nonEmpty, "fixture should produce >= 0.7 banded pairs")
    assert((banded.keySet -- exact.keySet).isEmpty,
      s"banded pairs missing from the lossless form: ${(banded.keySet -- exact.keySet).take(5)}")
    banded.foreach { case (p, j) => assert(exact(p) == j, s"score mismatch at $p") }
    info(s"q46b ${exact.size} pairs, q54>=0.7 ${banded.size}")
  }

  test("prefix candidates cover every result pair and shrink the pair space") {
    val tok = LlmText.bigramTokens(spark, dir)
    val nDocs = tok.select("doc_id").distinct().count()
    val allPairs = nDocs * (nDocs - 1) / 2
    val candidates = LlmText.jaccardPrefixCandidates(tok, 7, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val result = rows("q46b_jaccard_prefix_join").keySet
    assert((result -- candidates).isEmpty,
      s"candidate set lost result pairs: ${(result -- candidates).take(5)}")
    assert(candidates.size < allPairs / 2,
      s"no real pruning: ${candidates.size} candidates vs $allPairs all-pairs")
    info(f"candidates ${candidates.size}/$allPairs (${100.0 * candidates.size / allPairs}%.1f%% of n²), " +
      s"result pairs ${result.size}")
  }
}
