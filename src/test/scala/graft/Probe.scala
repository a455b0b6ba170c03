package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf probe (test scope, not part of the driver contract):
  * times individual warm/cold paths while chasing a regression.
  * Usage: sbt "Test/runMain graft.Probe <sfDir>".
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $tag%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("qc7_cdc_neardup_retraction")
    val qs = names.map(n => n -> SparkEntry.queries(n))
    for ((n, q) <- qs; i <- 1 to 2) time(s"$n run$i") { q(spark, d).collect() }
    // job-level breakdown of a warm run
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]
    val starts = new java.util.concurrent.ConcurrentHashMap[Integer, (Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(e.jobId, (System.nanoTime(),
          Option(e.properties.getProperty("spark.job.description")).getOrElse("?").take(60)))
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = starts.remove(e.jobId)
        if (st != null) jobs.add((e.jobId, System.nanoTime() - st._1, st._2))
      }
    })
    for ((n, q) <- qs) time(s"$n traced") { q(spark, d).collect() }
    Thread.sleep(500)
    jobs.forEach { case (id, ns, desc) =>
      println(f"PROBE job $id%3d ${ns / 1e9}%.2f s  $desc")
    }
    spark.stop()
  }
}
