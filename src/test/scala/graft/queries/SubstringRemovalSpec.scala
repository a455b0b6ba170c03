package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** q126_substring_removal: sliding-gram ExactSubstr removal.
  *
  * Besides the DuckDB oracle:
  *  1. plain-Scala replay at sf0.001 with EXACT gram strings (no 32-bit
  *     hashing) — the third-implementation doctrine;
  *  2. hand-built corpus: keep-first (the canonical doc is untouched —
  *     absent from output), a later doc loses exactly the copied span,
  *     and a straddling repeat that q119's fixed 10-token chunking is
  *     BLIND to (the motivating gap: chunks differ although a 10-gram
  *     repeats across the boundary);
  *  3. reconstruction identity on the fixture: removed + surviving
  *     token count == n_tokens for every emitted row.
  */
class SubstringRemovalSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"
  private val N = 10

  /** Plain-Scala reference: (doc_id -> (n_tokens, removed, new_text)),
    * affected docs only. */
  private def replay(corpus: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1) }
    val occ = toks.flatMap { case (id, ts) =>
      (0 to ts.length - N).map(p => (ts.slice(p, p + N).mkString(" "), id, p))
    }
    val canon = occ.groupBy(_._1).map { case (g, os) =>
      g -> os.map(o => (o._2, o._3)).min
    }
    val dups = occ.filter(o => canon(o._1) != ((o._2, o._3)))
      .groupBy(_._2).map { case (id, os) => id -> os.map(_._3).toSet }
    dups.map { case (id, ps) =>
      val ts = toks.find(_._1 == id).get._2
      val covered = ps.flatMap(p => p until p + N)
      val kept = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      id -> (ts.length.toLong, covered.size.toLong, kept.mkString(" "))
    }
  }

  test("q126 matches a plain-Scala exact-gram replay at sf0.001") {
    val corpus = Tables(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val exp = replay(corpus)
    val got = SparkEntry.queries("q126_substring_removal")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got === exp)
  }

  test("fixture rows reconstruct: removed + surviving tokens == n_tokens") {
    SparkEntry.queries("q126_substring_removal")(spark, dir).collect().foreach { r =>
      val survivors =
        if (r.getString(3).isEmpty) 0 else r.getString(3).split(" ", -1).length
      assert(r.getLong(2) + survivors === r.getLong(1), s"doc ${r.getLong(0)}")
      assert(r.getLong(2) > 0, s"doc ${r.getLong(0)} emitted but nothing removed")
    }
  }

  // ---- hand-built corpus -------------------------------------------

  private def run(corpus: Seq[(Long, String)]) = {
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
    LlmText.substringRemoval(df, N)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
  }

  private val span = (1 to 10).map(i => s"s$i").mkString(" ") // a 10-gram

  test("synthetic: canonical doc untouched, later doc loses exactly the span") {
    val corpus = Seq(
      1L -> s"$span a1 a2 a3 a4 a5",   // first occurrence — canonical
      2L -> s"b1 b2 b3 $span b4 b5")   // later — span removed
    assert(run(corpus) === Seq((2L, 15L, 10L, "b1 b2 b3 b4 b5")))
  }

  test("synthetic: boundary-straddling repeat that q119's chunking misses") {
    // the repeat sits at positions 6..15 of doc 2 — it straddles the
    // fixed 10-token chunk edge, so NO chunk of doc 2 equals any chunk
    // of doc 1 (q119 keeps everything), yet the sliding gram catches it
    val corpus = Seq(
      1L -> s"$span c1 c2 c3 c4 c5",
      2L -> s"d1 d2 d3 d4 d5 $span d6 d7 d8 d9 d10")
    assert(run(corpus) === Seq((2L, 20L, 10L, "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10")))
    val chunkDrop = LlmText.lineDedupStats(LlmText.lineChunks(
        spark.createDataFrame(corpus).toDF("doc_id", "text")))
      .selectExpr("sum(orig_chunks - kept_chunks)").collect()(0).getLong(0)
    assert(chunkDrop === 0L, "q119's chunker unexpectedly caught the straddle")
  }

  test("synthetic: whole-doc duplicate empties the later copy") {
    val text = (1 to 12).map(i => s"w$i").mkString(" ")
    val got = run(Seq(1L -> text, 2L -> text))
    assert(got === Seq((2L, 12L, 12L, "")))
  }
}
