package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** The composed banded near-dup pipelines (q54 MinHash bands → exact
  * set kernel; q55 multi-probe hyperplane LSH → exact ArrayDot) are the
  * shapes actually run at 100 TB. These specs pin their relationship to
  * the all-pairs fixture-scale verifiers (q46/q47): every banded result
  * is an exact result of the brute-force form (candidates are verified
  * exactly, so no false positives ever), and recall stays above the
  * analytically expected floor for each banding scheme.
  */
class BandedNearDupSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Map[(Long, Long), Double] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("q54 banded text near-dup is a subset of the all-pairs q46 with identical scores") {
    // q54's threshold (0.35) is above q46's (0.1), so every q54 row must
    // appear in q46 with the exact same jaccard — the banded pipeline
    // can never produce a false positive (candidates are verified
    // exactly by the codegen kernel)
    val banded = rows("q54_banded_neardup")
    val brute = rows("q46_ngram_jaccard")
    banded.foreach { case (pair, j) =>
      assert(brute.contains(pair), s"banded pair $pair not in all-pairs result")
      assert(brute(pair) == j, s"jaccard mismatch for $pair: banded $j vs brute ${brute(pair)}")
    }
  }

  test("q54 finds every strong duplicate (jaccard >= 0.9)") {
    // 8 bands × 2 minhashes: P(miss) = (1-j²)^8 ≤ 2e-6 at j = 0.9 —
    // a miss of a strong dup means the banding broke
    val banded = rows("q54_banded_neardup").keySet
    val strong = rows("q46_ngram_jaccard").filter(_._2 >= 0.9).keySet
    assert(strong.nonEmpty, "fixture should contain strong dups")
    assert((strong -- banded).isEmpty,
      s"strong dups missed by banding: ${(strong -- banded).take(5)}")
    val eligible = rows("q46_ngram_jaccard").count(_._2 >= 0.35)
    info(f"q54 recall vs q46 at the 0.35 threshold: ${banded.size}/$eligible")
  }

  test("hot band buckets are dropped: candidate count stays bounded") {
    // synthetic hot bucket (VERDICT r2 item 1): 1000 docs sharing one
    // band key would emit ~500k candidate pairs uncapped — the local
    // all-pairs blowup banding exists to prevent. With the cap, the hot
    // bucket contributes ZERO candidates while small buckets still pair.
    import spark.implicits._
    val hot = (0L until 1000L).map(i => (i, 1L, 1L))
    val small = (0 until 50).flatMap { b =>
      val k = 1000L + b
      Seq((2000L + 2 * b, k, k), ((2000L + 2 * b + 1), k, k))
    }
    val sig = (hot ++ small).toDF("doc_id", "h0", "h1")
    val capped = LlmText.bandedCandidates(sig, nBands = 1, bandR = 2).collect()
    assert(capped.length == 50, s"expected only the 50 small-bucket pairs, got ${capped.length}")
    assert(capped.forall(_.getLong(0) >= 2000L), "hot-bucket docs must not emit candidates")
    val uncapped = LlmText.bandedCandidates(sig, nBands = 1, bandR = 2,
      maxBucket = Int.MaxValue).count()
    assert(uncapped == 1000L * 999 / 2 + 50, "uncapped form must see the full blowup")
  }

  test("fixture band buckets are all far below the cap (hashes can't change)") {
    import org.apache.spark.sql.functions._
    // both production banding configs: q44 (3-gram, 8 bands × 1 hash) and
    // q54 (2-gram, 8 bands × 2 hashes) — guarded at sf0.1 too, because
    // that tier holds the only >100-member bucket (141 measured) and is
    // where a fixture regeneration would first push capped Spark results
    // away from the uncapped DuckDB oracle
    for (tier <- Seq(dir, "/root/testdata/sf0.1");
         (n, nBands, bandR) <- Seq((3, 8, 1), (2, 8, 2))) {
      val sig = LlmText.minhashSig(spark, tier, n, nBands * bandR)
      val keys = (0 until nBands).map(j =>
        struct((0 until bandR).map(k => col(s"h${bandR * j + k}").as(s"k$k")): _*))
      val maxBucket = sig.select(col("doc_id"),
          posexplode(array(keys: _*)).as(Seq("band", "key")))
        .groupBy(col("band"), col("key")).agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).head().getLong(0)
      assert(maxBucket <= LlmText.HotBucketCap / 2,
        s"$tier $n-gram ${nBands}x$bandR fixture bucket $maxBucket approaching cap — " +
          "capped results would diverge from the uncapped oracle")
    }
  }

  test("LSH code width follows the corpus-linked rule, fixed at the oracle tiers") {
    // VERDICT r10 item 3: candidate volume ∝ n²/2^bits at fixed width —
    // the rule keeps expected bucket occupancy (≈ 2³) constant as the
    // corpus grows, while the oracle tiers keep their historical 8 bits
    // so every committed hash is unchanged.
    assert(Vectors.lshBandBits(200) == 8)    // sf0.01 oracle tier
    assert(Vectors.lshBandBits(2000) == 8)   // sf0.1 bench tier
    assert(Vectors.lshBandBits(20000) == 12) // the derived sf1 tier
    assert(Vectors.lshBandBits(1) == 8)
    assert(Vectors.lshBandBits(2048) == 9)   // bitlen(2^k) = k+1
    // parity with the DuckDB derivation LENGTH(BIN(n)) − 3
    for (n <- Seq(1L, 7L, 255L, 256L, 2047L, 2048L, 20000L, 1000000L))
      assert(Vectors.lshBandBits(n) ==
        math.max(8, n.toBinaryString.length - 3), s"n=$n")
  }

  test("q55 LSH cosine near-dup is a subset of the all-pairs q47 with identical scores") {
    val banded = rows("q55_lsh_cosine_neardup")
    val brute = rows("q47_cosine_neardup")
    banded.foreach { case (pair, s) =>
      assert(brute.contains(pair), s"banded pair $pair not in all-pairs result")
      assert(brute(pair) == s, s"sim mismatch for $pair: banded $s vs brute ${brute(pair)}")
    }
    val recall = banded.size.toDouble / brute.size
    info(f"q55 recall vs q47: ${banded.size}/${brute.size} = $recall%.3f")
    // 8 bands × 8 bits, 1-bit multi-probe, threshold 0.4: expected
    // recall ≈ 0.7 (P(band) ≈ 0.14 at cos 0.4); floor leaves slack
    assert(recall >= 0.4, f"recall $recall%.3f below floor")
  }

  test("q70 semantic dedup: every drop is justified by an exact q47 pair") {
    // cluster-bucketed SemDeDup never fabricates a duplicate: a dropped
    // vector's (dup_of, vec_id) pair must be a real >= 0.4 cosine pair
    // in the all-pairs verifier, and the decision column must be total
    // (every vector decided, drops always attributed to a smaller id)
    val brute = rows("q47_cosine_neardup")
    val out = SparkEntry.queries("q70_semantic_dedup")(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(out.length == total, s"decision not total: ${out.length} of $total")
    out.foreach { r =>
      val (vec, action) = (r.getLong(0), r.getString(2))
      if (action == "drop") {
        val dupOf = r.getLong(3)
        assert(dupOf < vec, s"drop of $vec attributed to non-smaller $dupOf")
        assert(brute.contains((dupOf, vec)),
          s"drop of $vec (dup_of=$dupOf) has no exact >= 0.4 pair in q47")
      } else assert(r.isNullAt(3), s"keep row $vec carries a dup_of")
    }
    val drops = out.count(_.getString(2) == "drop")
    info(s"q70: $drops/${out.length} dropped")
    assert(drops > 0, "fixture should contain at least one semantic dup")
  }
}
