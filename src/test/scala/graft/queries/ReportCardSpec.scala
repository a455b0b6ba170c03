package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q133: the report card must reconcile exactly with the standalone
  * entries it composes — same corpus totals, same dup count, same
  * per-source quality where granularities align. */
class ReportCardSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("report-card totals reconcile with the corpus and the dedup entry") {
    val rows = SparkEntry.queries("q133_corpus_report_card")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5)))).toMap
    val docs = Tables(spark, dir, "documents")
    assert(rows.values.map(_._1).sum == docs.count(), "doc totals diverge")
    val tok = docs.select(sum(size(split(col("text"), " ")))).collect().head.getLong(0)
    assert(rows.values.map(_._2).sum == tok, "token totals diverge")
    // q41's dup surplus: groups with cnt>1 contribute ALL their members
    // to the report card's n_dup_docs (surplus + one keeper per group)
    val q41 = SparkEntry.queries("q41_exact_dedup")(spark, dir).collect().head
    val (groups, surplus) = (q41.getLong(0), q41.getLong(1))
    assert(rows.values.map(_._4).sum == surplus + groups,
      s"dup docs diverge from q41: ${rows.values.map(_._4).sum} vs ${surplus + groups}")
    // every cell is internally sane
    rows.foreach { case (k, (n, t, q, dup)) =>
      assert(n > 0 && t > 0 && dup >= 0 && dup <= n && q > 0.0 && q <= 1.0, s"$k: ($n,$t,$q,$dup)")
    }
  }
}
