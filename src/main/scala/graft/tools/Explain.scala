package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspection helper: `sbt "runMain graft.tools.Explain <query> [sfDir]"`
  * prints the formatted physical plan of any registered query — used to
  * keep PLAN_NOTES.md honest (pushdown / broadcast / codegen claims).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Explain <query> [sfDir]"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
