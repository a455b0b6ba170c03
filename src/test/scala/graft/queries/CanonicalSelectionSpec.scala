package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q120_canonical_selection: per near-dup cluster, keep the
  * highest-quality member (quality desc, doc_id asc tie).
  *
  * Third implementation besides the Spark side and the DuckDB oracle:
  * a plain-Scala union-find over the COLLECTED banded pairs plus a
  * plain-Scala replay of the q50 quality formula, composed driver-side
  * into the same keep decision.
  */
class CanonicalSelectionSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private case class Sel(nMembers: Long, keepDoc: Long, keepQ4: Long, nDropped: Long)

  /** Plain-Scala reference: rep_doc -> selection. */
  private def replay(pairs: Seq[(Long, Long)], quality: Map[Long, Long]): Map[Long, Sel] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = parent.keys.toSeq.groupBy(find)
    members.map { case (rep, docs) =>
      val keep = docs.minBy(id => (-quality(id), id))
      rep -> Sel(docs.size.toLong, keep, quality(keep), docs.size.toLong - 1)
    }
  }

  /** The q50 quality heuristic, floor-quantized to 1e-4, in plain Scala
    * (operation-for-operation the Spark expression tree). */
  private def q4Of(text: String): Long = {
    val toks = text.split(" ", -1)
    val nTok = toks.length
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "on", "for", "it")
    val nStop = toks.count(stop)
    val nChar = text.replace(" ", "").length
    val score = 0.4 * math.min(nTok / 50.0, 1.0) +
      0.3 * (nStop.toDouble / nTok) +
      0.3 * math.min((nChar.toDouble / nTok) / 5.0, 1.0)
    math.floor(score * 10000 + 0.5).toLong
  }

  test("q120 replays exactly from the collected pairs + quality formula") {
    val pairs = LlmText.bandedNearDupPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty, "fixture has no near-dup pairs — replay is vacuous")
    val quality = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> q4Of(r.getString(1))).toMap
    val expect = replay(pairs, quality)

    val got = SparkEntry.queries("q120_canonical_selection")(spark, dir)
      .collect().map { r =>
        val q4 = math.round(r.getDouble(3) * 10000)
        r.getLong(0) -> Sel(r.getLong(1), r.getLong(2), q4, r.getLong(4))
      }.toMap
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("q120 quality override is load-bearing: some keep is not the min-id rep") {
    val got = SparkEntry.queries("q120_canonical_selection")(spark, dir).collect()
    assert(got.exists(r => r.getLong(2) != r.getLong(0)),
      "every cluster keeps its min-id member — the quality argmax never decided anything")
  }
}
