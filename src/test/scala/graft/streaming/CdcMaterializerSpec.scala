package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

final case class CdcRow(op: String, sequence: Long, event_number: Long,
    id: Long, name: String)

/** CDC upsert semantics: insert / update_before / update_after / delete
  * applied to keyed state, in batch-merge and continuous form. */
class CdcMaterializerSpec extends AnyFunSuite with SparkTestSession {

  test("applyBatch merges latest-per-key and applies deletes") {
    import spark.implicits._
    val state = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("id", "name")
    val cdc = Seq(
      CdcRow("update_before", 10, 1, 2, "two"),
      CdcRow("update_after", 10, 2, 2, "TWO"),
      CdcRow("delete", 11, 1, 3, "three"),
      CdcRow("insert", 12, 1, 4, "four"),
      CdcRow("insert", 13, 1, 5, "five"),
      CdcRow("delete", 14, 1, 5, "five") // inserted then deleted in-batch
    ).toDF()
    val out = CdcMaterializer.applyBatch(state, cdc, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq(1L -> "one", 2L -> "TWO", 4L -> "four"))
  }

  test("applyBatch on empty state is a plain insert materialization") {
    import spark.implicits._
    val state = Seq.empty[(Long, String)].toDF("id", "name")
    val cdc = Seq(CdcRow("insert", 1, 1, 1, "a"), CdcRow("insert", 2, 1, 2, "b")).toDF()
    assert(CdcMaterializer.applyBatch(state, cdc, Seq("id")).count() == 2)
  }

  test("upsertStream keeps latest row per key and drops deleted keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CdcRow]
    val out = CdcMaterializer.upsertStream(spark, mem.toDF(), Seq("id"))
    val q = out.writeStream.format("memory").queryName("cdc_upsert")
      .outputMode("append").start()
    try {
      mem.addData(
        CdcRow("insert", 1, 1, 1, "a"),
        CdcRow("insert", 2, 1, 2, "b"),
        CdcRow("update_after", 3, 1, 1, "a2"),
        CdcRow("delete", 4, 1, 2, "b"))
      q.processAllAvailable()
      val latest = spark.table("cdc_upsert")
        .groupBy("id").agg(last("name").as("name"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // key 1 survives with latest value; key 2's final state was delete,
      // so its last emitted row (if any) precedes the delete
      assert(latest(1L) == "a2")
      assert(!latest.contains(2L))
    } finally q.stop()
  }
}
