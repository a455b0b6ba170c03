package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's parquet fixture tables (TESTDATA.md).
  *
  * At 100 TB these reads become partitioned parquet scans on a cluster; all
  * queries below go through [[Tables.apply]] so predicate pushdown / column
  * pruning reach the scan (verified via `.explain` — see PLAN_NOTES.md).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
    // default; read it as a nanos long and truncate to µs — the same
    // precision DuckDB coerces TIMESTAMP_NS to, keeping the oracle exact.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case None => df
    }
  }
}
