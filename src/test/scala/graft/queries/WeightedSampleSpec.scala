package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q109's A-ES draw must actually BE weighted: with weight = n_chars,
  * long documents must be overrepresented relative to a uniform draw —
  * pinned as sampled-mean-length > corpus-mean-length on the
  * deterministic fixture (364.7 vs 306.3 at sf0.001). A silent
  * regression to uniform sampling (e.g. dropping the /w from the key)
  * keeps every other invariant intact except this one.
  */
class WeightedSampleSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("length-weighted sample overrepresents long documents") {
    val sampled = SparkEntry.queries("q109_weighted_sample")(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val lens = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sampledMean = sampled.toSeq.map(lens).sum.toDouble / sampled.size
    val corpusMean = lens.values.sum.toDouble / lens.size
    assert(sampledMean > corpusMean,
      f"weighted sample mean $sampledMean%.1f not above corpus mean $corpusMean%.1f")
  }
}
