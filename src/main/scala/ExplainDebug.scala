import org.apache.spark.sql.SparkSession
object ExplainDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.01")
    df.explain("formatted")
    spark.stop()
  }
}
