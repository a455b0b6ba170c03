package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q119_line_dedup: duplicate-line removal with document
  * reconstruction (the C4/RefinedWeb curation step; "line" = 10-token
  * window on this fixture, see the entry comment).
  *
  * Checks beyond the DuckDB oracle:
  *  1. plain-Scala replay over the raw sf0.001 fixture (third
  *     implementation, the q112 doctrine);
  *  2. hand-built corpus covering keep-first across docs, keep-first
  *     WITHIN one doc, the unique-doc identity, and the all-dropped
  *     empty reconstruction;
  *  3. the reconstruction identity: any doc whose chunks are all kept
  *     must reassemble to its exact original text.
  */
class LineDedupSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"
  private val W = 10

  private case class DocOut(orig: Long, kept: Long, text: String)

  /** Plain-Scala reference: doc_id -> (orig_chunks, kept_chunks, new_text). */
  private def replay(corpus: Seq[(Long, String)]): Map[Long, DocOut] = {
    val chunks = corpus.flatMap { case (id, t) =>
      t.split(" ", -1).grouped(W).zipWithIndex.map { case (c, i) =>
        (id, i.toLong, c.mkString(" "))
      }
    }
    val byText = chunks.groupBy(_._3)
    val first = byText.map { case (c, occ) => c -> occ.map(o => (o._1, o._2)).min }
    val cnt = byText.map { case (c, occ) => c -> occ.size }
    corpus.map { case (id, _) =>
      val mine = chunks.filter(_._1 == id).sortBy(_._2)
      val kept = mine.filter(c => cnt(c._3) == 1 || first(c._3) == ((c._1, c._2)))
      id -> DocOut(mine.size.toLong, kept.size.toLong, kept.map(_._3).mkString(" "))
    }.toMap
  }

  private def run(d: String): Map[Long, DocOut] =
    SparkEntry.queries("q119_line_dedup")(spark, d)
      .collect().map(r => r.getLong(0) -> DocOut(r.getLong(1), r.getLong(2), r.getString(3))).toMap

  test("q119 replays exactly from the raw sf0.001 documents") {
    val corpus = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val expect = replay(corpus)
    assert(expect.values.exists(o => o.kept < o.orig),
      "fixture drops no chunk anywhere — the dedup path is vacuous")
    assert(run(dir) == expect)
  }

  test("q119 reconstruction identity: untouched docs reassemble verbatim") {
    val corpus = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val out = run(dir)
    val untouched = out.filter { case (_, o) => o.kept == o.orig }
    assert(untouched.nonEmpty, "every fixture doc lost a chunk — identity check is vacuous")
    untouched.foreach { case (id, o) =>
      assert(o.text == corpus(id), s"doc $id reassembled differently")
    }
  }

  test("q119 keep-first on a hand-built corpus") {
    val line = (1 to W).map(i => s"b$i").mkString(" ") // one full shared chunk
    val corpus = Seq(
      // doc 0 owns the first occurrence (chunk 0); its second chunk is
      // unique filler that also proves partial trailing chunks survive.
      0L -> s"$line u1 u2 u3",
      // doc 1 repeats `line` twice at chunk-aligned offsets: both drop
      // (doc 0 holds the first occurrence), leaving only its filler.
      1L -> s"$line $line v1",
      // doc 2 is exactly `line`: everything drops → empty new_text.
      2L -> line,
      // doc 3 is untouched filler (identity).
      3L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11")
    val tmp = java.nio.file.Files.createTempDirectory("q119docs").toString
    val df = spark.createDataFrame(corpus.map { case (id, t) =>
      (id, t, "en", "synth", t.length.toLong)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val got = run(tmp)
    val expect = Map(
      0L -> DocOut(2L, 2L, s"$line u1 u2 u3"),
      1L -> DocOut(3L, 1L, "v1"),
      2L -> DocOut(1L, 0L, ""),
      3L -> DocOut(2L, 2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"))
    assert(got == expect, s"got=$got expect=$expect")
    assert(replay(corpus) == expect)
  }
}
