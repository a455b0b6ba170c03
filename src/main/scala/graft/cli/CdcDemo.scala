package graft.cli

import org.apache.spark.sql.SparkSession

/** Demo CLI — the analog of the reference's `cmd/gomaxscale/main.go`
  * (A15): subscribe to one `database.table` CDC stream and print events
  * to stdout.
  *
  * Usage:
  *   sbt "runMain graft.cli.CdcDemo <host> <port> <database> <table>"
  * Env: MAXSCALE_USER / MAXSCALE_PASSWORD / MAXSCALE_GTID /
  *      MAXSCALE_VERSION / MAXSCALE_WIRE_TYPE=JSON|AVRO (optional).
  */
object CdcDemo {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: CdcDemo <host> <port> <database> <table>")
    val Array(host, port, database, table) = args.take(4)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName(s"maxscale-cdc-demo-$database.$table")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var reader = spark.readStream.format("maxscale-cdc")
      .option("host", host).option("port", port)
      .option("user", sys.env.getOrElse("MAXSCALE_USER", ""))
      .option("password", sys.env.getOrElse("MAXSCALE_PASSWORD", ""))
      .option("database", database).option("table", table)
    sys.env.get("MAXSCALE_GTID").foreach(g => reader = reader.option("gtid", g))
    sys.env.get("MAXSCALE_VERSION").foreach(v => reader = reader.option("version", v))
    sys.env.get("MAXSCALE_WIRE_TYPE").foreach(w => reader = reader.option("wireType", w))

    reader.load()
      .writeStream.format("console")
      .option("truncate", "false")
      .start()
      .awaitTermination()
  }
}
