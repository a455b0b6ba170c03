package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-technique operators: salted aggregation equivalence and
  * bucketed co-located joins (shuffle elimination verified in the
  * physical plan). */
class ScaleToolsSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("salted aggregation equals direct aggregation") {
    val li = Tables(spark, dir, "lineitem")
    val direct = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val saltedRes = Salting.saltedCountSum(li, Seq("l_returnflag"), "l_quantity",
        buckets = 8, entropy = Seq(col("l_orderkey"), col("l_linenumber")))
      .select(col("l_returnflag"), col("cnt"), round(col("sum"), 2).as("sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(saltedRes == direct)
  }

  test("salt column spreads a hot key over the requested buckets") {
    val li = Tables(spark, dir, "lineitem")
    val spread = li.select(Salting.saltColumn(8,
        Seq(col("l_orderkey"), col("l_linenumber"))).as("s"))
      .groupBy("s").count().collect()
    assert(spread.length == 8)
    val counts = spread.map(_.getLong(1))
    assert(counts.min > counts.max / 4, "salt should be roughly uniform")
  }

  test("partitioned layout prunes non-matching partitions at the scan") {
    // the other 100 TB storage lever next to bucketing: a filter on the
    // partition column must prune directories at planning time (the
    // scan's PartitionFilters), so a day/tenant-partitioned corpus reads
    // only the matching slice regardless of total size
    val tmp = java.nio.file.Files.createTempDirectory("graft-part").toString
    try {
      Tables(spark, dir, "lineitem")
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(tmp)
      val q = spark.read.parquet(tmp).where(col("l_returnflag") === "R")
        .agg(sum(col("l_quantity")).as("q"))
      val scan = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
      assert(scan.contains("PartitionFilters") && scan.contains("l_returnflag"),
        scan.take(800))
      // and the pruning is physical: the executed scan reads only the
      // matching directory's files (numFiles metric vs on-disk layout)
      q.collect()
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def findScan(p: SparkPlan): Option[FileSourceScanExec] = p match {
        case f: FileSourceScanExec => Some(f)
        case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
        case s: QueryStageExec => findScan(s.plan)
        case other => other.children.flatMap(findScan(_)).headOption
      }
      val scanExec = findScan(q.queryExecution.executedPlan).get
      val numFilesRead = scanExec.metrics("numFiles").value
      def parquetFilesUnder(p: java.io.File): Int =
        Option(p.listFiles()).toSeq.flatten.map {
          case d if d.isDirectory => parquetFilesUnder(d)
          case f if f.getName.endsWith(".parquet") => 1
          case _ => 0
        }.sum
      val all = parquetFilesUnder(new java.io.File(tmp))
      val rOnly = parquetFilesUnder(new java.io.File(s"$tmp/l_returnflag=R"))
      assert(rOnly > 0 && all > rOnly, s"layout: $all total, $rOnly in R")
      assert(numFilesRead == rOnly, s"scan read $numFilesRead files, expected $rOnly")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val o = Tables(spark, dir, "orders")
    val l = Tables(spark, dir, "lineitem")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    try {
      // co-located join: both sides pre-bucketed on the join key, so the
      // SMJ consumes bucket outputs directly — no Exchange in the plan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
        !plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"join keys should not be reshuffled:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
