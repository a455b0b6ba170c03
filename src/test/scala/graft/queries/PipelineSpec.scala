package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline-query invariants beyond the DuckDB oracle gate: the splits
  * partition the corpus, the curation funnel conserves documents, the
  * two-pass heavy hitter matches an in-Spark exact recount, and the
  * composed funnel plans without any all-pairs join. */
class PipelineSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("q58 splits partition the corpus (nothing lost, nothing doubled)") {
    val total = Tables(spark, dir, "documents").count()
    val rows = SparkEntry.queries("q58_hash_split")(spark, dir).collect()
    assert(rows.map(_.getAs[String]("split")).toSet == Set("train", "valid", "test"))
    assert(rows.map(_.getAs[Long]("cnt")).sum == total)
  }

  test("q58 assignment is independent of partitioning (pure per-row function)") {
    // same split membership whether the corpus sits in 1, 7, or 32
    // partitions — the property rand()-based splits do NOT have
    def membership(parts: Int): Map[Long, String] =
      Pipeline.splitAssignment(Tables(spark, dir, "documents").repartition(parts))
        .select(col("doc_id"), col("split")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val baseline = membership(1)
    for (parts <- Seq(7, 32)) assert(membership(parts) == baseline,
      s"split assignment changed under repartition($parts)")
  }

  test("q61 funnel conserves documents per lang") {
    val perLang = Tables(spark, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val funnel = SparkEntry.queries("q61_curation_funnel")(spark, dir).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getAs[Long]("cnt")).sum).toMap
    assert(funnel == perLang)
  }

  test("q61 plans with no all-pairs join") {
    val plan = SparkEntry.queries("q61_curation_funnel")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "funnel must not plan a BNLJ")
    assert(!plan.contains("CartesianProduct"), "funnel must not plan a cartesian")
  }

  test("q62 equals an exact in-Spark full recount") {
    val got = SparkEntry.queries("q62_heavy_hitters")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tok = Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val n = tok.count()
    val exact = tok.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * 40 > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
    assert(exact.nonEmpty, "fixture should have heavy hitters at n/40")
  }
}
