package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q117 batched vocab-capped BPE: a plain-Scala replay of the WHOLE
  * trainer (pair counting, candidate-window ordering, greedy
  * symbol-disjoint batch selection, fold re-tokenization, vocab-cap
  * stop) over the collected fixture, compared row-for-row against the
  * query — plus the structural claims the batching argument rests on:
  * per-round batches are symbol-disjoint, batch application is
  * order-independent (selection order ≡ reverse ≡ simultaneous fold),
  * the cap truncates training, and the first batched merge equals
  * q81b's first serial greedy merge. */
class BpeBatchedSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private val B = Pipeline.BpeBatchSize
  private val K = Pipeline.BpeVocabCap
  private val R = Pipeline.BpeBatchRounds
  private val C = Pipeline.BpeBatchTopC

  /** Fold re-tokenization with a whole batch: merge (last, x) when the
    * pair is in the accepted set — the oracle's list_reduce semantics,
    * reimplemented independently of the engine's replace() chain. */
  private def applyBatch(toks: Vector[String],
      pairs: Set[(String, String)]): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (x <- toks) {
      if (out.nonEmpty && pairs((out.last, x)))
        out(out.length - 1) = out.last + x
      else out += x
    }
    out.toVector
  }

  /** Serial single-pair left-to-right non-overlapping merge (the q81b
    * rule), for the order-independence check. */
  private def applyOne(toks: Vector[String], a: String, b: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += a + b; i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toVector
  }

  /** The full independent replay: returns the merge table and the
    * per-round (encoding-before, selected) snapshots for the
    * order-independence check. */
  private def replay(): (Seq[(Int, Int, String, String, Long)],
      Seq[(Map[Vector[String], Long], Seq[(String, Long)])]) = {
    var enc: Map[Vector[String], Long] = Tables(spark, dir, "documents")
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.length >= 2))
      .groupBy(identity).map { case (w, ws) =>
        w.split("").toVector -> ws.length.toLong
      }.toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String, String, Long)]
    val rounds = scala.collection.mutable.ArrayBuffer
      .empty[(Map[Vector[String], Long], Seq[(String, Long)])]
    for (r <- 1 to R) {
      val limit = math.min(B, K - merges.size)
      if (limit > 0) {
        val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
        for ((toks, c) <- enc; i <- 0 until toks.length - 1)
          counts(toks(i) + " " + toks(i + 1)) += c
        val tops = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(C)
        // greedy symbol-disjoint selection, written independently of
        // Pipeline.selectDisjointBatch
        val used = scala.collection.mutable.Set.empty[String]
        val sel = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        for ((pair, cnt) <- tops if sel.size < limit) {
          val Array(a, b) = pair.split(" ", 2)
          if (Seq(a, b, a + b).forall(sym => !used(sym))) {
            sel += ((pair, cnt)); used ++= Seq(a, b, a + b)
          }
        }
        rounds += ((enc, sel.toSeq))
        sel.zipWithIndex.foreach { case ((pair, cnt), i) =>
          merges += ((r, i + 1, pair, pair.replace(" ", ""), cnt))
        }
        if (sel.nonEmpty) {
          val pairSet = sel.map { case (p, _) =>
            val Array(a, b) = p.split(" ", 2); (a, b)
          }.toSet
          enc = enc.toSeq.map { case (toks, c) => (applyBatch(toks, pairSet), c) }
            .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }.toMap
        }
      }
    }
    (merges.toSeq, rounds.toSeq)
  }

  test("q117 matches an independent driver-side batched-trainer replay") {
    val (expect, _) = replay()
    val got = SparkEntry.queries("q117_bpe_vocab_capped")(spark, dir).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Int]("rank"), r.getString(2),
        r.getString(3), r.getAs[Long]("cnt"))).toSeq
    assert(got == expect, s"merge tables disagree:\n got $got\n exp $expect")
  }

  test("q117 batches are symbol-disjoint, load-bearing, and cap-stopped") {
    val rows = SparkEntry.queries("q117_bpe_vocab_capped")(spark, dir).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Int]("rank"), r.getString(2)))
    assert(rows.length <= K, "vocab cap exceeded")
    val byRound = rows.groupBy(_._1)
    // per-round limit: min(B, K - merges before the round)
    var prior = 0
    for (r <- 1 to R; batch <- byRound.get(r)) {
      assert(batch.length <= math.min(B, K - prior), s"round $r over limit")
      val syms = batch.flatMap { case (_, _, p) =>
        val Array(a, b) = p.split(" ", 2); Seq(a, b, a + b)
      }
      assert(syms.distinct.length == syms.length,
        s"round $r batch not symbol-disjoint: $batch")
      prior += batch.length
    }
    assert(byRound.values.exists(_.length > 1),
      "no round batched >1 merge — batching never exercised")
    assert(rows.length == K,
      "fixture never reaches the vocab cap — the stop is untested")
    assert(byRound(R).length < B,
      "cap did not truncate the last round — mid-round stop untested")
  }

  test("q117 batch application is order-independent (the disjointness guarantee)") {
    val (_, rounds) = replay()
    for (((enc, sel), r) <- rounds.zipWithIndex if sel.nonEmpty) {
      val pairs = sel.map { case (p, _) =>
        val Array(a, b) = p.split(" ", 2); (a, b)
      }
      val pairSet = pairs.toSet
      for ((toks, _) <- enc) {
        val folded = applyBatch(toks, pairSet)
        val serial = pairs.foldLeft(toks) { case (t, (a, b)) => applyOne(t, a, b) }
        val reversed = pairs.reverse.foldLeft(toks) { case (t, (a, b)) => applyOne(t, a, b) }
        assert(folded == serial && folded == reversed,
          s"round ${r + 1}: batch application order-dependent on $toks")
      }
    }
  }

  test("q117's first merge is q81b's first serial greedy merge") {
    val serial = SparkEntry.queries("q81b_bpe_merge_training")(spark, dir).collect()
      .minBy(_.getAs[Int]("round"))
    val batched = SparkEntry.queries("q117_bpe_vocab_capped")(spark, dir).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Int]("rank"), r.getString(2)))
      .min
    assert(batched._3 == serial.getString(1),
      "batched round-1 rank-1 merge differs from the serial argmax")
  }

  /** Full encoder from the replayed merge table: per-ROUND batch folds
    * in round order (the q135 contract — training order, all rounds,
    * including the last round's merges the trainer itself never needs
    * to apply). */
  private def encoderFrom(merges: Seq[(Int, Int, String, String, Long)])
      : String => Vector[String] = {
    val byRound = merges.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, ms) =>
      ms.map { m => val Array(a, b) = m._3.split(" ", 2); (a, b) }.toSet
    }
    w => byRound.foldLeft(w.split("").toVector)((t, ps) => applyBatch(t, ps))
  }

  test("q135 encode matches a driver-side per-round fold replay; tokens reconstruct words") {
    val (merges, _) = replay()
    val encode = encoderFrom(merges)
    val mergedSyms = merges.map(_._4).toSet
    val docsRows = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
    val cache = scala.collection.mutable.Map.empty[String, Long]
    def ntok(w: String): Long =
      if (w.length == 1) 1L else cache.getOrElseUpdate(w, encode(w).length.toLong)
    val expect = docsRows.map { r =>
      val ws = r.getString(1).split(" ").filter(_.nonEmpty)
      (r.getLong(0), ws.length.toLong, ws.map(ntok).sum)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("q135_bpe_encode")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, "per-doc BPE token counts diverge from the fold replay")

    // structural: the encoding is a segmentation of the word into
    // trained symbols (multi-char tokens are exactly learned merges),
    // and the trained merges actually compress the fixture vocab
    val vocab = docsRows.flatMap(_.getString(1).split(" "))
      .filter(_.length >= 2).distinct
    for (w <- vocab) {
      val t = encode(w)
      assert(t.mkString == w, s"tokens do not reconstruct '$w'")
      assert(t.forall(tok => tok.length == 1 || mergedSyms(tok)),
        s"unlearned multi-char token in encoding of '$w'")
    }
    assert(vocab.exists(w => encode(w).length < w.length),
      "no fixture word compressed - the encode entry is vacuous here")
  }

  test("q135 must fold round-by-round: an all-merges-at-once fold diverges") {
    // round-1 learns (b c), round-2 learns (a b): per-round encoding of
    // "abc" is a|bc (round 1 wins, as in training); one fold over both
    // rounds' merges lets the LATER round preempt the earlier one
    val perRound = applyBatch(applyBatch(Vector("a", "b", "c"),
      Set(("b", "c"))), Set(("a", "b")))
    val allAtOnce = applyBatch(Vector("a", "b", "c"),
      Set(("b", "c"), ("a", "b")))
    assert(perRound == Vector("a", "bc"))
    assert(allAtOnce == Vector("ab", "c"))
    assert(perRound != allAtOnce,
      "the round-order counterexample no longer holds")
  }
}
