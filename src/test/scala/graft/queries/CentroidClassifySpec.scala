package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q85 nearest-centroid classification invariants beyond the oracle:
  * the confusion matrix conserves the label population, the classifier
  * beats the random-label floor (fixture labels carry geometric
  * signal), and classification is partitioning-independent (centroids
  * are plan literals; assignment is a pure map). */
class CentroidClassifySpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("q85 confusion matrix conserves per-label counts and beats chance") {
    val rows = SparkEntry.queries("q85_centroid_classify")(spark, dir).collect()
    val rowSums = rows.groupBy(_.getAs[Int]("true_label")).view
      .mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    val labelCounts = Tables(spark, dir, "embeddings")
      .groupBy(col("label")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rowSums == labelCounts, "every vector must be classified exactly once")
    val total = rows.map(_.getAs[Long]("n")).sum
    val diag = rows.filter(r => r.getAs[Int]("true_label") == r.getAs[Int]("pred_label"))
      .map(_.getAs[Long]("n")).sum
    val nLabels = labelCounts.size
    assert(diag.toDouble / total > 2.0 / nLabels,
      s"accuracy ${diag.toDouble / total} not above 2x the 1/$nLabels random floor")
  }

  test("q85 predictions are independent of input partitioning") {
    import graft.operators.KMeansLloyd
    def predict(parts: Int): Map[Long, Int] = {
      val vecs = Tables(spark, dir, "embeddings").repartition(parts)
        .select(col("vec_id"), col("label"), KMeansLloyd.quantize(col("embedding")).as("xi"))
      val cents = KMeansLloyd.update(vecs.withColumn("cell", col("label")))
      KMeansLloyd.assign(vecs, cents)
        .select(col("vec_id"), col("cell")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    }
    val base = predict(1)
    assert(predict(13) == base, "assignment changed under repartition")
  }
}
