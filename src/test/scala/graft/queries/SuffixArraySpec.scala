package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** q125/q125b: suffix-array exact-substring analytics.
  *
  * Three independent checks besides the DuckDB oracle:
  *  1. a plain-Scala suffix-sort REPLAY over the raw sf0.001 fixture
  *     (third implementation, the q107/q112 doctrine) for BOTH entries;
  *  2. a hand-crafted corpus exercising the definitional edge cases:
  *     whole-doc duplicates (both prev witnesses NULL), a mid-doc
  *     cross-doc repeat, an INTRA-doc repeat (counted by q125,
  *     excluded from q125b's cross-doc report), and the
  *     shifted-suffix cascade that left-maximality must suppress;
  *  3. the containment invariant vs the gram family: every doc q112
  *     flags (a 5-gram shared with ANOTHER doc) must appear in q125
  *     (longest repeat ≥ 5 anywhere), since a shared 5-gram IS a
  *     ≥ 5-token repeat.
  */
class SuffixArraySpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  /** Plain-Scala reference: adjacent-pair LCPs over the capped suffix
    * sort. Returns (perDocMax ≥ 5, left-maximal cross-doc repeats). */
  private def replay(corpus: Seq[(Long, String)])
      : (Map[Long, (Long, Long)], Set[(Long, String)]) = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1) }
    val sfx = toks.flatMap { case (id, ts) =>
      (1 to ts.length).map { pos =>
        val key = ts.slice(pos - 1, pos - 1 + SuffixArray.Depth)
        val prev = if (pos == 1) null else ts(pos - 2)
        (key.mkString(" "), id, pos, prev, key, ts.length.toLong)
      }
    }.sortBy { case (ss, id, pos, _, _, _) => (ss, id, pos) }
    val adj = sfx.zip(sfx.drop(1)).map { case (a, b) =>
      val lcp = a._5.zip(b._5).takeWhile { case (x, y) => x == y }.size.toLong
      (a._2, a._4, a._6, b._2, b._4, b._6, lcp, a._5.take(lcp.toInt).mkString(" "))
    }
    val perDoc = adj.flatMap { case (da, _, na, db, _, nb, lcp, _) =>
      Seq((da, na, lcp), (db, nb, lcp))
    }.groupBy(_._1).map { case (id, xs) =>
      id -> (xs.map(_._3).max, xs.head._2)
    }.filter(_._2._1 >= 5)
    // class-level repeats, straight from the DEFINITION (independent of
    // the engine's occurrence-interval argument): candidates are the
    // pair snippets (every right-maximal repeat string is one);
    // occurrences of each candidate are found by scanning EVERY corpus
    // position for a prefix match; a class qualifies iff it spans ≥ 2
    // docs and not all occurrences share one preceding token.
    val candSet = adj.collect { case (_, _, _, _, _, _, lcp, sn) if lcp >= 10 => (lcp, sn) }.toSet
    val reps = candSet.filter { case (_, sn) =>
      val wt = sn.split(" ", -1)
      val occ = toks.flatMap { case (id, ts) =>
        (1 to ts.length - wt.length + 1).collect {
          case pos if ts.slice(pos - 1, pos - 1 + wt.length).sameElements(wt) =>
            (id, if (pos == 1) null else ts(pos - 2))
        }
      }
      occ.map(_._1).distinct.size >= 2 &&
        (occ.exists(_._2 == null) || occ.map(_._2).distinct.size >= 2)
    }
    (perDoc.toMap, reps)
  }

  private def fixtureCorpus: Seq[(Long, String)] =
    Tables(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("q125 matches a plain-Scala suffix-sort replay at sf0.001") {
    val (exp, _) = replay(fixtureCorpus)
    val got = SparkEntry.queries("q125_longest_dup_substring")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === exp)
  }

  test("q125b matches the replay's left-maximal cross-doc repeats at sf0.001") {
    val (_, reps) = replay(fixtureCorpus)
    val expTop = reps.toSeq.sortBy { case (l, s) => (-l, s) }.take(20)
    val got = SparkEntry.queries("q125b_top_repeated_substrings")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === expTop)
  }

  test("q112's cross-doc 5-gram doc set is contained in q125's repeat set") {
    val gram = SparkEntry.queries("q112_duplicate_spans")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sa = SparkEntry.queries("q125_longest_dup_substring")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gram.subsetOf(sa),
      s"q112 docs missing from q125: ${(gram -- sa).toSeq.sorted.take(10)}")
  }

  // ---- hand-crafted corpus ----------------------------------------

  private def lcpOf(corpus: Seq[(Long, String)]): DataFrame = {
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
    SuffixArray.adjacentLcpOf(df)
  }

  private val corpus = Seq(
    1L -> "a b c d e f g h i j k l",                 // 12 tokens
    2L -> "x y a b c d e f g h i j q r",             // copies 1..10 of doc 1, left ctx 'y'
    3L -> "a b c d e f g h i j k l",                 // exact whole-doc dup of doc 1
    4L -> "p q r s t u p q r s t u",                 // intra-doc 6-token repeat
    5L -> "zz only unique tokens here none repeat")  // no repeats ≥ 5

  test("synthetic: per-doc longest repeats, including the intra-doc one") {
    val got = SuffixArray.longestDupPerDoc(lcpOf(corpus))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc1/doc3 are identical 12-token docs; doc2 shares their 10-token
    // prefix run; doc4 repeats its 6-token half intra-doc; doc5 clean.
    assert(got === Seq((1L, 12L, 12L), (2L, 10L, 14L), (3L, 12L, 12L), (4L, 6L, 12L)))
  }

  test("synthetic: left-maximality keeps alignments, kills the suffix cascade") {
    val got = SuffixArray.topRepeats(lcpOf(corpus), minLen = 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // Exactly two cross-doc left-maximal repeats: the whole doc (both
    // sides at doc start, NULL witnesses) and the 10-token copied run
    // (doc1 at start vs doc2 after 'y'). The 11 shifted suffixes of the
    // 12-token match and 9 of the 10-token match must all be absent,
    // and doc4's intra-doc repeat must not leak into the cross-doc view.
    assert(got === Seq(
      (12L, "a b c d e f g h i j k l"),
      (10L, "a b c d e f g h i j")))
  }

  test("synthetic: class-level left-maximality sees non-adjacent context (3 occurrences)") {
    // The ADVICE r9 trap: w occurs 3×. In rank order the only CROSS-DOC
    // adjacent pair (doc1@2, doc2@2) shares preceding token 'x'; the
    // distinct-context occurrence (doc2@14, preceded by 'y') is only
    // ever adjacent to its own doc. The per-pair test dropped w; the
    // class-level test sees prevs {x, x, y} across all occurrences.
    val w = (1 to 10).map(i => s"m$i").mkString(" ")
    val trap = Seq(
      1L -> s"x $w",
      2L -> s"x $w a1 y $w zz")
    val got = SuffixArray.topRepeats(lcpOf(trap))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // "x w" (11 tokens) is also reported — both its occurrences sit at
    // doc starts, which is left-maximal by definition; the point of the
    // trap is that (10, w) is PRESENT (the per-pair test dropped it).
    assert(got === Seq((11L, s"x $w"), (10L, w)), s"got=$got")
  }

  test("synthetic: ranks are contiguous and ordered by (suffix, doc, pos)") {
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val r = SuffixArray.rankedSuffixesOf(df)
      .selectExpr("rk", "concat_ws(' ', sfx) AS ss", "doc_id", "pos")
      .collect().map(x => (x.getLong(0), (x.getString(1), x.getLong(2), x.getInt(3))))
      .sortBy(_._1)
    assert(r.map(_._1).toSeq === r.indices.map(_.toLong))
    assert(r.map(_._2).toSeq === r.map(_._2).sortBy(identity).toSeq)
  }
}
