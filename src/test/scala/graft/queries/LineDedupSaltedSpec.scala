package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q119b: the salted skew escape-hatch must (1) produce bit-identical
  * results to plain q119 — same oracle, so the fixture tier is already
  * hash-gated; here a synthetic HOT corpus checks equality where the
  * skew actually bites — and (2) genuinely spread a hot chunk's rows
  * across salts at level 1 (the whole point of the shape). */
class LineDedupSaltedSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  /** 400 docs all sharing one boilerplate 10-token chunk (the hot key),
    * each with a unique second chunk. */
  private def hotCorpus = {
    val banner = (1 to 10).map(i => s"hot$i").mkString(" ")
    spark.createDataFrame(
      (1 to 400).map(i => (i.toLong, s"$banner u${i}a u${i}b u${i}c"))
    ).toDF("doc_id", "text")
  }

  test("salted form equals the window form on a synthetic hot corpus") {
    val ch = LlmText.lineChunks(hotCorpus)
    def collectStats(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val plain = collectStats(LlmText.lineDedupStats(ch))
    val salted = collectStats(LlmText.lineDedupStatsSalted(ch))
    assert(plain.nonEmpty && salted == plain)
    // keep-first really happened: doc 1 keeps the banner, doc 2 loses it
    assert(plain(1L)._2 == 2L && plain(2L)._2 == 1L)
  }

  test("a hot chunk's occurrences spread across salts at level 1") {
    val banner = (1 to 10).map(i => s"hot$i").mkString(" ")
    val l1 = LlmText.saltedChunkPartials(LlmText.lineChunks(hotCorpus), salts = 8)
    val spread = l1.where(col("chunk") === banner)
      .agg(countDistinct(col("salt")).as("ns"), sum(col("c1")).as("total"))
      .collect().head
    assert(spread.getLong(0) == 8L, s"hot chunk used ${spread.getLong(0)}/8 salts")
    assert(spread.getLong(1) == 400L)
    // and the level-2 fold still finds the global first owner
    val first = l1.where(col("chunk") === banner)
      .agg(min(col("f1")).as("first")).select("first.doc_id").collect().head.getLong(0)
    assert(first == 1L)
  }

  test("q119b equals q119 on the fixture corpus") {
    val a = SparkEntry.queries("q119_line_dedup")(spark, dir).collect().toSeq
    val b = SparkEntry.queries("q119b_line_dedup_salted")(spark, dir).collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("the salted plan has no chunk-partitioned window and two agg levels") {
    val plan = SparkEntry.queries("q119b_line_dedup_salted")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "escape-hatch must not fall back to the window form")
    assert(plan.contains("salt"), "level-1 salted aggregation missing from the plan")
  }
}
