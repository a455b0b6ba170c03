package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom reduction's correctness contract: NO false negatives —
  * every fact row whose key exists on the build side must survive the
  * probe (a drop there would silently shrink the exact join) — while
  * false positives are bounded enough that the filter actually filters.
  */
class BloomReduceSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("bloom probe keeps every true match and drops most non-matches") {
    val urgent = Tables(spark, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = BloomReduce.bloomOf(urgent, col("o_orderkey"))
    val li = Tables(spark, dir, "lineitem").select(col("l_orderkey"))

    val total = li.count()
    val trueMatches = li.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val kept = li.where(BloomReduce.mightContain(bloom, col("l_orderkey"))).count()
    val keptTrue = li.where(BloomReduce.mightContain(bloom, col("l_orderkey")))
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi").count()

    assert(trueMatches > 0, "fixture should have urgent lineitems")
    assert(keptTrue == trueMatches, s"bloom dropped true matches: $keptTrue of $trueMatches survived")
    assert(kept < total, s"bloom filtered nothing: kept $kept of $total")
    info(s"kept $kept of $total rows ($trueMatches true matches, " +
      f"${(kept - trueMatches).toDouble / math.max(1, total - trueMatches) * 100}%.2f%% false-positive rate)")
  }
}
