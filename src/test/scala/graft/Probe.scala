package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf probe (test scope, not part of the driver contract):
  * times individual warm/cold paths while chasing a regression.
  * Usage: sbt "Test/runMain graft.Probe <sfDir>".
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    graft.operators.BucketedTables.sessionConfs
      .foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vecs = Tables(spark, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val unit = vecs.map { case (id, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      id -> v.map(_ / n)
    }
    val K = 6
    val truth: Map[Long, Set[Long]] = unit.map { case (i, u) =>
      val scored = unit.filter(_._1 != i).map { case (j, w) =>
        val dotp = u.zip(w).map { case (a, b) => a * b }.sum
        (math.floor(dotp * 10000 + 0.5) / 10000, j)
      }
      i -> scored.sortBy { case (s, j) => (-s, j) }.take(K).map(_._2).toSet
    }.toMap
    for (r <- 0 to 5) {
      val t0 = System.nanoTime()
      val got = graft.queries.Vectors.nnDescentGraph(spark, d, r, searchK = 16)
        .where(col("rnk") <= K)
        .select(col("src"), col("dst")).collect()
        .map(x => (x.getLong(0), x.getLong(1)))
        .groupBy(_._1).map { case (s, a) => s -> a.map(_._2).toSet }
      val hits = truth.toSeq.map { case (i, t) =>
        (t intersect got.getOrElse(i, Set.empty)).size
      }.sum
      val rec = hits.toDouble / (truth.size * K)
      println(f"PROBE rounds=$r recall=$rec%.3f t=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
