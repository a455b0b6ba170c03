package graft

import graft.functions.BpeEncode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q142 / VERDICT r12 item 3: the native-retokenize wide-batch trainer
  * (`trainBatchedNative`). Three claims: (1) at q138's constants it is
  * BIT-IDENTICAL to the replace-chain trainer (same algorithm, new
  * execution); (2) at WIDE constants — batch widths the replace-chain
  * could never plan — it still matches the plain-Scala replay
  * bit-for-bit and its table encodes to the replay's own final
  * tokenization; (3) width is load-bearing: the wide run learns
  * strictly more merges per round than the 512-capped run where the
  * alphabet allows. The ≥8k-merges / ≤2×-wall claim at the derived sf1
  * tier is ScaleProbe's row (this spec pins correctness, the probe
  * pins scale). */
class BpeWideTrainSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def derivedVocab(): Map[String, Long] = {
    import graft.queries.Pipeline
    Pipeline.bpeBigWords(spark, dir)
      .where(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("native-retokenize trainer equals the replace-chain trainer at q138's constants") {
    import graft.queries.Pipeline
    val chain = Pipeline.bpeBigMerges(spark, dir)
    val native = Pipeline.bpeWideMerges(spark, dir)
    assert(native == chain,
      "trainBatchedNative diverges from trainBatched at identical constants")
  }

  test("wide constants: merge table matches the plain-Scala replay; encode matches its final state") {
    import graft.queries.Pipeline
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // batch 4096 / topC 16384: a round this wide would be a 4096-deep
    // replace() chain under the old trainer — unplannable (the q135
    // planning-ceiling measurement); the native loop runs it as one
    // compiled pass + a bigger hash set
    val (rounds, batch, cap, topC) = (16, 4096, 100000, 16384)
    val wide = Pipeline.trainBatchedNative(
      Pipeline.bpeBigUnits(spark, dir), rounds, batch, cap, topC)
    val vocab = derivedVocab()
    val (replayed, finalToks) = BpeReplay.train(vocab, rounds, batch, cap, topC)
    assert(wide == replayed,
      "wide-constants table diverges from the plain-Scala replay")
    // strictly deeper than the q138 configuration on the same corpus
    assert(wide.size > Pipeline.bpeWideMerges(spark, dir).size,
      "wide run learned no more merges than the 1400-cap q138 run")
    // the learned table ENCODES back to training's own final state
    val mergeRounds = (1 to rounds).map(r =>
      wide.filter(_._1 == r).sortBy(_._2).map(_._3))
    import spark.implicits._
    val vdf = vocab.keys.toSeq.sorted.toDF("w")
    val toks = ColumnBridge.column(BpeEncode(
      ColumnBridge.expression(regexp_extract_all(col("w"), lit(".{1,2}"), lit(0))),
      mergeRounds))
    val native = vdf.select(col("w"), toks.as("t")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(native == finalToks,
      "native encode of the wide table diverges from training's final tokenization")
  }

  test("round width is alphabet-bounded, not planner-bounded: a 600-wide round trains exactly") {
    import graft.queries.Pipeline
    import spark.implicits._
    // synthetic corpus engineered so round 1 admits MORE disjoint
    // pairs than the old 512 replace-chain ceiling: 600 four-char
    // words u_i+v_i over 1200 DISTINCT two-char units — every
    // candidate pair is symbol-disjoint from every other, so the
    // greedy selection accepts all 600 in ONE round (a 600-deep
    // replace() chain under the old trainer; one hash set here).
    // sf0.001's natural alphabet is too small to cross 512 (measured
    // 51-94/round), which is exactly the point: the bound moved from
    // the planner to the data.
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val units = (for (a <- alpha; b <- alpha) yield s"$a$b").take(1200)
    val words = (0 until 600).map(i => (Seq(units(2 * i), units(2 * i + 1)), 1L))
    val wide = Pipeline.trainBatchedNative(
      words.toDF("u", "wcnt"), rounds = 2, batch = 4096,
      cap = 100000, topC = 16384)
    assert(wide.count(_._1 == 1) == 600,
      s"round 1 accepted ${wide.count(_._1 == 1)} of 600 disjoint pairs")
    // bit-parity with the replay on the same synthetic vocab
    val vocab = words.map { case (u, c) => (u.mkString, c) }.toMap
    val (replayed, _) = BpeReplay.train(vocab, 2, 4096, 100000, 16384)
    assert(wide == replayed)
  }
}
