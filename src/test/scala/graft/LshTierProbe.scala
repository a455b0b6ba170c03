package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for the 100k-vector LSH tier (round-11 width-rule
  * follow-through): measures code-bucket occupancy and candidate
  * volume at the widened width, so the q55/q115 scaling story is
  * grounded in the measured distribution rather than the uniform
  * model. Usage: sbt "Test/runMain graft.LshTierProbe [dir]". */
object LshTierProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/tmp/vec100k")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = Tables(spark, d, "embeddings").count()
    val bits = math.max(8, (64 - java.lang.Long.numberOfLeadingZeros(math.max(n, 1L))) - 3)
    println(s"PROBE n=$n bits=$bits")

    val codes = Tables(spark, d, "embeddings")
      .select(col("vec_id"), posexplode(
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.LshCodes(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(
              col("embedding")), bits))).as(Seq("band", "code")))
      .localCheckpoint(true)

    val occ = codes.groupBy(col("band"), col("code")).agg(count(lit(1)).as("bsz"))
      .localCheckpoint(true)
    occ.agg(max(col("bsz")).as("max"), avg(col("bsz")).as("avg"),
        count(lit(1)).as("buckets")).show(false)
    println("top-10 buckets:")
    occ.orderBy(col("bsz").desc).show(10, false)
    // candidate volume without distinct: sum over buckets of matches
    val pairsPerBucket = occ
      .agg(sum(col("bsz") * (col("bsz") - 1) / 2).as("exact_pairs")).show(false)
    // capped-build join volume: probes x bucket size, cap at HotBucketCap
    val capped = occ.withColumn("eff", least(col("bsz"), lit(graft.queries.LlmText.HotBucketCap)))
      .agg(sum(col("bsz") * lit(bits + 1) * col("eff")).as("join_rows")).show(false)
    spark.stop()
  }
}
