package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q124_curation_pipeline: the composed curation DAG (quality gate →
  * cluster keep-best → line dedup over survivors → shard manifest).
  *
  * Third implementation: the whole DAG replayed in plain Scala from
  * the collected pairs + raw fixture, stage by stage, and compared to
  * the engine's 16-row manifest. Every stage must BITE on the fixture
  * (drop at least one doc / line) — a stage that never decides
  * anything would make the composition test vacuous.
  */
class CurationPipelineSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"
  private val T = 5000L
  private val W = 10

  private def md5Hex(x: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

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

  test("q124 manifest replays stage-by-stage; every stage bites") {
    val corpus = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = LlmText.bandedNearDupPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // stage 1: quality gate
    val q4 = corpus.map { case (id, t) => id -> q4Of(t) }
    val qual = corpus.keySet.filter(id => q4(id) >= T)
    assert(qual.size < corpus.size, "quality gate dropped nothing")

    // stage 2: cluster keep-best among qualified members
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clusteredQual = qual.filter(parent.contains)
    val keepers = clusteredQual.groupBy(find).values
      .map(ms => ms.toSeq.minBy(id => (-q4(id), id))).toSet
    val survivors = (qual -- clusteredQual) ++ keepers
    assert(survivors.size < qual.size, "cluster collapse dropped nothing")

    // stage 3: line dedup over the SURVIVOR corpus
    val chunks = survivors.toSeq.sorted.flatMap { id =>
      corpus(id).split(" ", -1).grouped(W).zipWithIndex.map { case (c, i) =>
        (id, i.toLong, c.mkString(" "))
      }
    }
    val byText = chunks.groupBy(_._3)
    val first = byText.map { case (c, o) => c -> o.map(x => (x._1, x._2)).min }
    val cnt = byText.map { case (c, o) => c -> o.size }
    val kept = survivors.toSeq.map { id =>
      id -> chunks.count(c => c._1 == id &&
        (cnt(c._3) == 1 || first(c._3) == ((c._1, c._2))))
    }.toMap
    assert(kept.values.sum < chunks.size, "line dedup dropped nothing")
    val fin = kept.filter(_._2 > 0)

    // stage 4: shard manifest
    val expect = fin.toSeq.groupBy { case (id, _) =>
      java.lang.Long.parseLong(md5Hex(s"shard:$id").substring(0, 8), 16) % 16
    }.map { case (sh, g) => sh -> ((g.size.toLong, g.map(_._2.toLong).sum)) }

    val got = SparkEntry.queries("q124_curation_pipeline")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect, s"got=$got expect=$expect")
  }
}
