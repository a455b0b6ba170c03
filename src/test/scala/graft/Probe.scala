package graft

import org.apache.spark.sql.SparkSession

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
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import org.apache.spark.sql.functions._
    import graft.queries.LlmText
    val docsDf = Tables(spark, d, "documents")
    for (i <- 1 to 2) t(s"q112-$i") { SparkEntry.queries("q112_duplicate_spans")(spark, d).collect() }
    for (i <- 1 to 2) t(s"q112b-$i") { SparkEntry.queries("q112b_multiscale_dup_spans")(spark, d).collect() }
    val g5 = LlmText.dupSpanGrams(docsDf, 5)
    val gAll = LlmText.dupSpanGrams(docsDf, 5, 10, 20)
    t("grams5-count") { println("  rows=" + g5.count()) }
    t("gramsAll-count") { println("  rows=" + gAll.count()) }
    t("grams5-collect-h") { g5.select(sum(col("h"))).collect() }
    t("gramsAll-collect-h") { gAll.select(sum(col("h"))).collect() }
    val dup5 = g5.groupBy(col("n"), col("h"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .where(col("mn") =!= col("mx")).select(col("n"), col("h"))
    t("dup5-count") { println("  rows=" + dup5.count()) }
    t("hits5-count") { println("  rows=" + g5.join(dup5, Seq("n", "h")).count()) }
    t("stats5") { LlmText.dupSpanStats(g5).collect() }
    println("PROBE explain q112:")
    println(SparkEntry.queries("q112_duplicate_spans")(spark, d)
      .queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Reused") ||
        l.contains("Scan") || l.contains("Window") || l.contains("Generate"))
      .mkString("\n"))
    spark.stop()
  }
}
