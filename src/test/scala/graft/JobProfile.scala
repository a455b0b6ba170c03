package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Driver-scheduling profiler for one registry entry: counts Spark jobs
  * and sums their wall-clock (job-time sum vs entry wall = the
  * scheduling/serialization residual the VERDICT r12 item-5 work
  * targets). Usage:
  *   sbt "Test/runMain graft.JobProfile <entry> [sfDir] [reps]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
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

    val verbose = sys.env.contains("JOB_PROFILE_VERBOSE")
    val nJobs = new java.util.concurrent.atomic.AtomicLong
    val jobMs = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (j.time,
          Option(j.properties).map { p =>
            // SQL-submitted jobs carry no callSite property; the job
            // description (defaulted by Spark to the action call site)
            // and the execution id are the usable labels there
            Seq("callSite.short", "spark.job.description",
              "spark.jobGroup.id", "spark.sql.execution.id")
              .flatMap(k => Option(p.getProperty(k)).filter(_.nonEmpty)
                .map(v => s"$k=$v"))
              .mkString(" | ") match { case "" => "?"; case s => s }
          }.getOrElse("?")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        nJobs.incrementAndGet()
        Option(starts.remove(j.jobId)).foreach { case (t0, site) =>
          jobMs.addAndGet(j.time - t0)
          if (verbose) println(f"  JOB ${j.jobId}%3d ${(j.time - t0) / 1000.0}%6.2fs  $site")
        }
      }
    })

    val q = SparkEntry.allDefs.find(_.name == name).getOrElse(
      sys.error(s"no entry named $name"))
    for (r <- 1 to reps) {
      nJobs.set(0); jobMs.set(0)
      val t0 = System.nanoTime()
      q.run(spark, dir).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"PROFILE $name rep=$r wall=$wall%.2fs jobs=${nJobs.get()} " +
        f"job_time_sum=${jobMs.get() / 1000.0}%.2fs")
    }
    spark.stop()
  }
}
