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
    t("pairs-cold") { graft.queries.LlmText.bandedNearDupPairs(spark, d).collect() }
    t("pairs-warm") { graft.queries.LlmText.bandedNearDupPairs(spark, d).collect() }
    println("PROBE pairs rows = " + graft.queries.LlmText.bandedNearDupPairs(spark, d).count())
    for (i <- 1 to 3) t(s"q99-$i") { SparkEntry.queries("q99_neardup_triangles")(spark, d).collect() }
    val q99 = SparkEntry.queries("q99_neardup_triangles")(spark, d)
    t("q99-optimize-only") { q99.queryExecution.optimizedPlan }
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    def census(pairs: DataFrame): DataFrame = {
      val edges = pairs.union(pairs.select(col("doc_b"), col("doc_a"))).toDF("src", "dst")
      val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      val withDeg = edges
        .join(deg.select(col("node").as("src"), col("deg").as("sdeg")), Seq("src"))
        .join(deg.select(col("node").as("dst"), col("deg").as("ddeg")), Seq("dst"))
      val oriented = withDeg.where(col("sdeg") < col("ddeg") ||
          (col("sdeg") === col("ddeg") && col("src") < col("dst")))
        .select(col("src"), col("dst"), col("ddeg"))
      val wedges = oriented.as("e1").join(oriented.as("e2"),
          col("e1.src") === col("e2.src") &&
            (col("e1.ddeg") < col("e2.ddeg") ||
              (col("e1.ddeg") === col("e2.ddeg") && col("e1.dst") < col("e2.dst"))))
        .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))
      val tri = wedges.join(
        oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
      tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    }
    val cachedPairs = graft.queries.LlmText.bandedNearDupPairs(spark, d)
      .select(col("doc_a"), col("doc_b"))
    for (i <- 1 to 2) t(s"census-cached-$i") { census(cachedPairs).collect() }
    val lcp = cachedPairs.localCheckpoint(true)
    for (i <- 1 to 2) t(s"census-lcp-$i") { census(lcp).collect() }
    for (i <- 1 to 3) t(s"q63-$i") { SparkEntry.queries("q63_tfidf_top_terms")(spark, d).collect() }
    spark.stop()
  }
}
