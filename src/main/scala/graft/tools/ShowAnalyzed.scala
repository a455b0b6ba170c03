package graft.tools

import org.apache.spark.sql.SparkSession

object ShowAnalyzed {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q12_asof_join")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    // scalastyle:off println
    println("=== ANALYZED ===")
    println(df.queryExecution.analyzed.treeString(true))
    spark.stop()
  }
}
