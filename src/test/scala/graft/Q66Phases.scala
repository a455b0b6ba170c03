package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off phase timer for the q66 family (VERDICT r12 item 5): wall
  * per pipeline phase, warm session. Usage:
  *   sbt "Test/runMain graft.Q66Phases [sfDir] [shufflePartitions]"
  */
object Q66Phases {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val parts = args.lift(1).getOrElse("32")
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    graft.operators.BucketedTables.sessionConfs
      .foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $what ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      import graft.streaming.IncrementalNearDup
      val st = timed("state")(
        graft.queries.LlmText.bigramStateCached(spark, dir))
      val statePath = graft.util.Scratch.dir("q66-phase")
      val inc = new IncrementalNearDup(statePath)
      timed("wave1")(inc.processState(st.where(col("doc_id") % 2 === 0), 0L))
      timed("wave2")(inc.processState(st.where(col("doc_id") % 2 === 1), 1L))
      val g = timed("groups")(inc.groups(spark).localCheckpoint(true))
      timed("tail")(g.groupBy(col("rep").as("rep_doc"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy(col("rep_doc")).collect())
    }
    spark.stop()
  }
}
