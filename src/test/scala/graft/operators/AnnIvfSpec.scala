package graft.operators

import graft.{SparkTestSession, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF index: probing a fraction of cells must cut the scanned pair
  * space while retaining most true nearest neighbors. */
class AnnIvfSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("IVF probe scans fewer vectors and keeps recall") {
    val emb = Tables(spark, dir, "embeddings")
    val n = emb.count()
    val index = AnnIvf.build(spark, emb, "vec_id", "embedding", nCells = 16)
    assert(index.cells.select("cell").distinct().count() > 1)

    val queries = index.cells.where(col("vec_id") < 20)
    val approx = AnnIvf.query(spark, index, queries, "vec_id", k = 1, nProbe = 8)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap

    // exact top-1 via brute force
    val e = emb.select(col("vec_id"), vecDouble(col("embedding")).as("v"))
    val q = e.where(col("vec_id") < 20).select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    val exact = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), cosine(col("v"), col("qv")).as("sim"))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") === 1)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("vec_id")).toMap

    val recall = exact.count { case (qid, nid) => approx.get(qid).contains(nid) }.toDouble / exact.size
    assert(recall >= 0.5, s"recall@1 was $recall")

    // probing 8/16 cells must scan roughly half the corpus per query
    val scanned = AnnIvf.query(spark, index, queries.limit(1), "vec_id", k = n.toInt, nProbe = 8).count()
    assert(scanned < n, s"probe scanned the whole corpus ($scanned of $n)")
  }
}
