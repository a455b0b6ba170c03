package graft.streaming

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.concurrent.TrieMap

final case class DriftEvent(ts: java.sql.Timestamp, event_type: String, value: Double)

/** Stream==batch parity for the PSI drift monitor: feeding the fixture
  * events through DriftMonitor.runningPsi in shuffled waves must end
  * with exactly the batch q107 PSI per type — counts accumulate by
  * addition and both sides quantize through the shared
  * Behavioral.psiE10 fold, so arrival order cannot move a single bit.
  */
class DriftMonitorSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("streaming running PSI drains to the batch q107 result under shuffled arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = graft.Tables(spark, dir, "events")
      .select(col("ts"), col("event_type"), col("value"))
      .as[DriftEvent].collect()
    val shuffled = new scala.util.Random(7).shuffle(events.toVector)
    val waves = shuffled.grouped((shuffled.size / 3) + 1).toSeq

    val latest = TrieMap.empty[String, Long]
    var emissions = 0
    val mem = MemoryStream[DriftEvent]
    val q = DriftMonitor.runningPsi(graft.queries.Behavioral.binnedDrift(mem.toDF()))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          latest.put(r.getString(0), r.getLong(1)); emissions += 1
        }
      }
      .start()
    try {
      waves.foreach { w =>
        mem.addData(w: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batchPsi = SparkEntry.queries("q107_distribution_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(latest.toMap == batchPsi,
      s"stream drained to ${latest.toMap}, batch says $batchPsi")
    // mid-stream emissions happened (the monitor reports per batch, not
    // only at the end)
    assert(emissions > batchPsi.size, s"only $emissions emissions")
  }
}
