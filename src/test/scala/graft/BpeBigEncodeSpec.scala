package graft

import graft.functions.BpeEncode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q138: the production-scale BPE table (>= 1k merges) and the native
  * encode expression. The trainer is replayed bit-for-bit in plain
  * Scala (third implementation, independent of both the Spark loop and
  * the DuckDB oracle chain), and the native expression's token arrays
  * are pinned against an in-memory encoder AND against the replayed
  * training's own final tokenization — the chain-parity VERDICT r11
  * item 3 asks for. */
class BpeBigEncodeSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  /** Plain-Scala replay of the batched trainer — shared third
    * implementation, see [[BpeReplay]]. */
  private def replayTrain(vocab: Map[String, Long], rounds: Int, batch: Int,
      cap: Int, topC: Int): (Seq[(Int, Int, String, String, Long)], Map[String, Seq[String]]) =
    BpeReplay.train(vocab, rounds, batch, cap, topC)

  private def derivedVocab(): Map[String, Long] = {
    import graft.queries.Pipeline
    Pipeline.bpeBigWords(spark, dir)
      .where(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("the big trainer reaches >= 1000 merges and matches the plain-Scala replay bit-for-bit") {
    import graft.queries.Pipeline
    val engine = Pipeline.bpeBigMerges(spark, dir)
    assert(engine.size >= 1000,
      s"production-scale table must hold >= 1000 merges, got ${engine.size}")
    val (replayed, _) = replayTrain(derivedVocab(), Pipeline.BpeBigRounds,
      Pipeline.BpeBigBatch, Pipeline.BpeBigVocabCap, Pipeline.BpeBigTopC)
    assert(engine == replayed, "engine merge table diverges from the replay")
  }

  test("native encode == in-memory encoder == the training chain's final tokenization") {
    import graft.queries.Pipeline
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val rounds = Pipeline.bpeBigMergeRounds(spark, dir)
    val vocab = derivedVocab()
    // independent in-memory encoder over the replayed merge table
    val roundSets = rounds.map(_.map { p =>
      val Array(a, b) = p.split(" ", 2); (a, b)
    }.toSet)
    def encodeMem(w: String): Seq[String] = {
      var t: Seq[String] = w.grouped(2).toSeq
      for (ps <- roundSets if t.size > 1 && ps.nonEmpty) {
        val out = scala.collection.mutable.ArrayBuffer(t.head)
        for (x <- t.tail) {
          if (ps((out.last, x))) out(out.size - 1) = out.last + x
          else out += x
        }
        t = out.toSeq
      }
      t
    }
    // the native expression over the same vocab
    import spark.implicits._
    val vdf = vocab.keys.toSeq.sorted.toDF("w")
    val toks = ColumnBridge.column(BpeEncode(
      ColumnBridge.expression(regexp_extract_all(col("w"), lit(".{1,2}"), lit(0))),
      rounds))
    val native = vdf.select(col("w"), toks.as("t")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    val mem = vocab.keys.map(w => w -> encodeMem(w)).toMap
    assert(native == mem, "native expression diverges from the in-memory encoder")
    // and both equal training's own final state: a fresh encode of a
    // training word reproduces the tokenization training left it with
    val (_, trainFinal) = replayTrain(vocab, Pipeline.BpeBigRounds,
      Pipeline.BpeBigBatch, Pipeline.BpeBigVocabCap, Pipeline.BpeBigTopC)
    assert(native == trainFinal,
      "fresh native encode diverges from the training chain's final tokenization")
    // the table is load-bearing: some word must actually compress
    assert(native.exists { case (w, t) => t.size < w.grouped(2).size })
  }

  test("encode edge cases: single unit, odd length, cross-round chaining") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import spark.implicits._
    // round 1 merges (ab, cd); round 2 chains onto round 1's MERGED
    // symbol (abcd ← (ab+cd) then + e1f) — legal across rounds, never
    // within one (symbol-disjointness); "zz" has no merges
    val table = Seq(Seq("ab cd"), Seq("abcd ef"))
    def enc(w: String): Seq[String] = {
      val df = Seq(w).toDF("w")
      df.select(ColumnBridge.column(BpeEncode(
        ColumnBridge.expression(regexp_extract_all(col("w"), lit(".{1,2}"), lit(0))),
        table)).as("t"))
        .collect()(0).getSeq[String](0).toSeq
    }
    assert(enc("a") == Seq("a"))           // single odd unit
    assert(enc("ab") == Seq("ab"))         // single whole unit
    assert(enc("abcd") == Seq("abcd"))     // round-1 merge
    assert(enc("abcdef") == Seq("abcdef")) // round-2 chains on round 1
    assert(enc("abcde") == Seq("abcd", "e")) // odd tail blocks round 2
    assert(enc("zzabcd") == Seq("zz", "abcd")) // prefix unaffected
  }
}
