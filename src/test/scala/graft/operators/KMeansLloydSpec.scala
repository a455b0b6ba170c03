package graft.operators

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMeansLloyd invariants beyond the q68 oracle hash: the clustering is
  * a pure function of the data (partitioning-independent), recovers
  * well-separated clusters exactly, and the q68 output conserves the
  * corpus. */
class KMeansLloydSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def fixtureVecs(parts: Int) =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), KMeansLloyd.quantize(col("embedding")).as("xi"))
      .repartition(parts)

  test("assignment is independent of partitioning (quantized integer math)") {
    def membership(parts: Int): Map[Long, Int] =
      KMeansLloyd.run(fixtureVecs(parts), "vec_id", k = 4, iters = 2)._1
        .select(col("vec_id"), col("cell")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val baseline = membership(1)
    assert(baseline.nonEmpty)
    for (parts <- Seq(5, 8)) assert(membership(parts) == baseline,
      s"cell assignment changed under repartition($parts)")
  }

  test("recovers well-separated synthetic clusters exactly") {
    import spark.implicits._
    // three tight clusters far apart on distinct axes; ids interleaved
    // across clusters so seed ids (lowest 3) span all three clusters
    val pts = (0 until 30).map { i =>
      val c = i % 3
      val base = Array.fill(8)(0.0)
      base(c) = 10.0
      base((c + 3) % 8) = 10.0
      (i.toLong, base.map(_ + (i / 3) * 0.001)) // tiny intra-cluster jitter
    }
    val vecs = pts.toDF("vec_id", "embedding")
      .select(col("vec_id"), KMeansLloyd.quantize(col("embedding")).as("xi"))
    val (assigned, cents) = KMeansLloyd.run(vecs, "vec_id", k = 3, iters = 2)
    val byCell = assigned.select(col("vec_id"), col("cell")).collect()
      .groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(byCell.values.toSet ==
      (0 until 3).map(c => (0 until 30).filter(_ % 3 == c).map(_.toLong).toSet).toSet,
      s"clusters not recovered: $byCell")
    // centroids sit on the cluster means (10 ± jitter, quantized µ units)
    assert(cents.size == 3)
    for (c <- cents) {
      val hot = c.ci.count(v => math.abs(v) > 9000000L)
      assert(hot == 2, s"centroid ${c.cell} should have exactly 2 hot dims: ${c.ci.mkString(",")}")
    }
  }

  test("matches an independent driver-side Lloyd's on random data (differential)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val data = (0 until 120).map(i =>
      (i.toLong, Array.fill(6)(math.floor(rnd.nextDouble() * 2e6 - 1e6).toLong)))
    for ((k, iters) <- Seq((2, 1), (3, 2), (5, 3))) {
      // reference: same rules (lowest-id seeds, exact integer distances,
      // ties to lower cell, floor(sum/n + 0.5) re-quantization, empty
      // cells dropped), implemented independently over plain collections
      var cents: Seq[(Int, Array[Long])] =
        data.sortBy(_._1).take(k).zipWithIndex.map { case ((_, xi), i) => (i, xi) }
      var assignRef: Map[Long, Int] = Map.empty
      for (_ <- 1 to iters) {
        assignRef = data.map { case (id, xi) =>
          id -> cents.map { case (c, ci) =>
            (xi.zip(ci).map { case (x, y) => (x - y) * (x - y) }.sum, c)
          }.min._2
        }.toMap
        val byCell = data.groupBy(p => assignRef(p._1))
        cents = byCell.toSeq.sortBy(_._1).map { case (c, pts) =>
          (c, (0 until 6).map { d =>
            math.floor(pts.map(_._2(d)).sum.toDouble / pts.size + 0.5).toLong
          }.toArray)
        }
      }
      val vecs = data.toDF("vec_id", "xi").repartition(7)
      val (assigned, gotCents) = KMeansLloyd.run(vecs, "vec_id", k, iters)
      val gotAssign = assigned.select(col("vec_id"), col("cell")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(gotAssign == assignRef, s"k=$k iters=$iters: assignment diverged")
      assert(gotCents.map(c => c.cell -> c.ci.toSeq).toMap ==
        cents.map { case (c, ci) => c -> ci.toSeq }.toMap,
        s"k=$k iters=$iters: centroids diverged")
    }
  }

  test("q68 conserves the corpus and emits integer centroid norms") {
    val total = Tables(spark, dir, "embeddings").count()
    val rows = SparkEntry.queries("q68_kmeans_cells")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_members")).sum == total)
    assert(rows.forall(_.getAs[Long]("centroid_norm2") > 0L))
    val cells = rows.map(_.getAs[Long]("cell"))
    assert(cells.sameElements(cells.sorted), "output must be ordered by cell")
  }
}
