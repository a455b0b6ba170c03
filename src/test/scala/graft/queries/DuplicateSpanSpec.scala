package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q112_duplicate_spans: substring-level dedup (Lee et al. 2022
  * granularity at word-5-gram resolution).
  *
  * Two independent checks besides the DuckDB oracle:
  *  1. a driver-side island-merge REPLAY over the raw sf0.001 fixture —
  *     plain Scala, exact gram strings (no 32-bit hashing), the
  *     q107/q110 doctrine: a third implementation so a shared
  *     misunderstanding between the two SQL engines can't hide;
  *  2. a hand-crafted synthetic corpus whose expected spans are
  *     computed BY HAND, exercising the merge edge cases the random
  *     fixture may not: overlapping gram hits, exactly-adjacent
  *     islands (gap 0 merges), gap-1 splits, a doc with two islands,
  *     and a whole-doc duplicate.
  */
class DuplicateSpanSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"
  private val N = 5

  /** Plain-Scala reference: (doc_id -> (n_spans, dup_tokens, n_tokens)). */
  private def replay(corpus: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    // split(text, ' ') in Spark keeps trailing empties (limit -1)
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1) }
      .filter(_._2.length >= N)
    val grams = toks.flatMap { case (id, ts) =>
      (0 to ts.length - N).map(p => (id, p, ts.slice(p, p + N).mkString(" ")))
    }
    val dupGrams = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val hits = grams.filter(g => dupGrams(g._3)).groupBy(_._1)
    hits.map { case (id, gs) =>
      val len = toks.find(_._1 == id).get._2.length.toLong
      var spans = List.empty[(Long, Long)] // (start, end) islands, reversed
      gs.map(_._2.toLong).sorted.foreach { p =>
        spans match {
          case (s, e) :: rest if p <= e + 1 => spans = (s, math.max(e, p + N - 1)) :: rest
          case _ => spans = (p, p + N - 1) :: spans
        }
      }
      id -> (spans.size.toLong, spans.map { case (s, e) => e - s + 1 }.sum, len)
    }
  }

  private def run(d: String): Map[Long, (Long, Long, Long)] =
    SparkEntry.queries("q112_duplicate_spans")(spark, d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("q112 replays exactly from the raw sf0.001 documents") {
    val corpus = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val expect = replay(corpus)
    assert(expect.nonEmpty, "fixture has no duplicate 5-grams — replay is vacuous")
    assert(run(dir) == expect)
  }

  test("q112 island merge on a hand-built corpus") {
    val boiler = (1 to 7).map(i => s"b$i").mkString(" ") // 7-token shared run
    val corpus = Seq(
      // doc 0 and 1 share `boiler` at different offsets: gram hits at
      // pos p, p+1, p+2 overlap → ONE island of 7 tokens each.
      0L -> s"u01 u02 $boiler u03 u04",
      1L -> s"v01 $boiler v02 v03 v04",
      // doc 2: two copies of `boiler` separated by SIX unique tokens —
      // islands [2,8] and [15,21], gap 15-9=6 > 1 → stays two spans.
      2L -> s"w01 w02 $boiler w03 w04 w05 w06 w07 w08 $boiler w09",
      // doc 3 and 4: identical 9-token docs → whole doc one span.
      3L -> "d1 d2 d3 d4 d5 d6 d7 d8 d9",
      4L -> "d1 d2 d3 d4 d5 d6 d7 d8 d9",
      // doc 5: shares d1..d5 and d5..d9 pieces? no — unique filler only,
      // no 5-gram shared with anyone → absent from the output.
      5L -> "x1 x2 x3 x4 x5 x6 x7 x8 x9",
      // doc 6: too short for a 5-gram → filtered before gramming.
      6L -> "y1 y2 y3 y4")
    val tmp = java.nio.file.Files.createTempDirectory("q112docs").toString
    val df = spark.createDataFrame(corpus.map { case (id, t) =>
      (id, t, "en", "synth", t.length.toLong)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val got = run(tmp)
    val expect = Map(
      0L -> (1L, 7L, 11L),
      1L -> (1L, 7L, 11L),
      2L -> (2L, 14L, 23L),
      3L -> (1L, 9L, 9L),
      4L -> (1L, 9L, 9L))
    assert(got == expect, s"got=$got expect=$expect")
    // and the hand-built corpus agrees with the replay reference too
    assert(replay(corpus) == expect)
  }
}
