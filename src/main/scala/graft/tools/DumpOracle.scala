package graft.tools
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val m = graft.SparkEntry.oracleSql
    args.foreach { q => println("=== " + q); println(m(q)) }
  }
}
