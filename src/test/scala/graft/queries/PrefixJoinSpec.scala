package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** q46b (AllPairs/PPJoin prefix-filtered exact Jaccard) claims to be a
  * LOSSLESS plan rewrite of q46's all-pairs form: same pairs, same
  * scores, with candidate generation bounded by shared prefix tokens
  * instead of n². These specs pin both halves of that claim — exact
  * result equality, and real candidate-space shrinkage (the filter must
  * prune, or the entry is all-pairs with extra steps).
  */
class PrefixJoinSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Map[(Long, Long), Double] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("q46b equals q46 exactly — prefix filtering is lossless") {
    val brute = rows("q46_ngram_jaccard")
    val prefix = rows("q46b_jaccard_prefix_join")
    assert(brute.nonEmpty, "fixture should produce jaccard pairs")
    assert(prefix == brute,
      s"prefix-join diverged from all-pairs: missing=${(brute.keySet -- prefix.keySet).take(5)} " +
        s"extra=${(prefix.keySet -- brute.keySet).take(5)}")
  }

  test("prefix candidates cover every result pair and shrink the pair space") {
    val tok = LlmText.bigramTokens(spark, dir)
    val nDocs = tok.select("doc_id").distinct().count()
    val allPairs = nDocs * (nDocs - 1) / 2
    val candidates = LlmText.jaccardPrefixCandidates(tok).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val result = rows("q46_ngram_jaccard").keySet
    assert((result -- candidates).isEmpty,
      s"candidate set lost result pairs: ${(result -- candidates).take(5)}")
    assert(candidates.size < allPairs,
      s"no pruning: ${candidates.size} candidates vs $allPairs all-pairs")
    info(f"candidates ${candidates.size}/$allPairs (${100.0 * candidates.size / allPairs}%.1f%% of n²), " +
      s"result pairs ${result.size}")
  }
}
