package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): times every registered
  * query at `SPARK_GRAFT_SF_DIR`, prints ONE JSON line.
  *
  * Timings materialize the full result (`collect()`, not `count()` —
  * counting lets Spark skip projection work entirely for limit-style
  * queries). Two warmup queries run first so JIT/codegen compilation
  * doesn't land on the first measured query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: exercise scan, shuffle-agg, broadcast-join, window codegen
    Seq("q01_scan_count", "q13_agg_hash", "q06_join_multiway")
      .foreach(n => try SparkEntry.queries(n)(spark, sfDir).collect()
        catch { case _: Throwable => () })

    val results = SparkEntry.allDefs.map { q =>
      val t0 = System.nanoTime()
      val ok = try { q.run(spark, sfDir).collect(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}"); false }
      q.name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
