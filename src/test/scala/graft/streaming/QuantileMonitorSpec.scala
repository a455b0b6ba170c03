package graft.streaming

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.concurrent.TrieMap

final case class QVal(event_type: String, value: Double)

/** Stream==batch parity for the running quantile monitor: histogram
  * bins merge by addition and both sides quantize through the shared
  * Behavioral.histQuantiles rule, so any shuffled arrival must drain
  * to exactly the batch q108 quantiles.
  */
class QuantileMonitorSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("streaming running quantiles drain to the batch q108 result under shuffled arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val vals = graft.Tables(spark, dir, "events")
      .select(col("event_type"), col("value")).as[QVal].collect()
    val shuffled = new scala.util.Random(13).shuffle(vals.toVector)
    val waves = shuffled.grouped((shuffled.size / 3) + 1).toSeq

    val latest = TrieMap.empty[String, (Long, Long, Long)]
    val mem = MemoryStream[QVal]
    val q = QuantileMonitor.runningQuantiles(
        graft.queries.Behavioral.centsBinned(mem.toDF()))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          latest.put(r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))
        }
      }
      .start()
    try {
      waves.foreach { w =>
        mem.addData(w: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batchQ = SparkEntry.queries("q108_histogram_quantiles")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(latest.toMap == batchQ,
      s"stream drained to ${latest.toMap}, batch says $batchQ")
  }
}
