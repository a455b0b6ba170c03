package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

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
    // events.ts has shipped as TIMESTAMP(NANOS) (which Spark 4 rejects
    // by default) and, since the 2026-08-13 fixture regeneration, as
    // µs-precision with isAdjustedToUTC=false (which Spark 4 infers as
    // TIMESTAMP_NTZ — a type unix_micros()/bigint casts reject). Both
    // normalize HERE, the single fixture chokepoint, to a session-TZ
    // TIMESTAMP: the sessions all run UTC, so the NTZ→LTZ cast and the
    // nanos→µs truncation land on the exact instants DuckDB's naive
    // TIMESTAMP oracle sees.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) => df.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
      case _ => df
    }
  }
}
