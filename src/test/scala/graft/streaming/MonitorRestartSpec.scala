package graft.streaming

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.concurrent.TrieMap

/** Checkpoint-restart drills for the three stateful monitors
  * (DriftMonitor, QuantileMonitor, SourceCap): a production monitor's
  * defining property is SURVIVING A RESTART — the shuffled-arrival
  * parity specs prove order-independence but always drain in one
  * query incarnation, so a monitor that silently lost its state store
  * on restart would still pass them wave-by-wave. Here each monitor is
  * killed after EVERY wave and restarted from its checkpoint before
  * the next, so the final emission only matches the batch query if the
  * per-key state (count grids / bin maps / cap buffers) was recovered
  * from the state store each time — a fresh-state restart would
  * recount from zero and the bit-for-bit assertion breaks.
  *
  * The drift drill additionally runs under the RocksDB state store
  * provider (the 100 TB configuration — keyed state off-heap, spill-
  * free), so recovery is exercised against the store class a real
  * deployment uses, not just the in-memory HDFS-backed default.
  */
class MonitorRestartSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  /** Run `out` through `waves`, stopping the query after each wave and
    * restarting it from `ckpt` before the next — every wave boundary
    * is a kill/recover cycle. */
  private def runWithRestarts[T](mem: MemoryStream[T], out: DataFrame,
      ckpt: String, waves: Seq[Seq[T]])(onRow: org.apache.spark.sql.Row => Unit): Unit = {
    def start(): StreamingQuery = out.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach(onRow)
        ()
      }
      .start()
    waves.foreach { w =>
      val q = start()
      try {
        mem.addData(w: _*)
        q.processAllAvailable()
      } finally q.stop()
    }
  }

  test("DriftMonitor recovers its count grid across restarts (RocksDB state store)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = graft.Tables(spark, dir, "events")
        .select(col("ts"), col("event_type"), col("value"))
        .as[DriftEvent].collect()
      val waves = new scala.util.Random(11).shuffle(events.toVector)
        .grouped((events.length / 3) + 1).toSeq
      val latest = TrieMap.empty[String, Long]
      val mem = MemoryStream[DriftEvent]
      val out = DriftMonitor.runningPsi(graft.queries.Behavioral.binnedDrift(mem.toDF()))
      runWithRestarts(mem, out,
        java.nio.file.Files.createTempDirectory("drift-restart").toString, waves) { r =>
        latest.put(r.getString(0), r.getLong(1))
      }
      val batch = SparkEntry.queries("q107_distribution_drift")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(latest.toMap == batch,
        s"restarted stream drained to ${latest.toMap}, batch says $batch")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("QuantileMonitor recovers its bin map across restarts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vals = graft.Tables(spark, dir, "events")
      .select(col("event_type"), col("value")).as[QVal].collect()
    val waves = new scala.util.Random(17).shuffle(vals.toVector)
      .grouped((vals.length / 3) + 1).toSeq
    val latest = TrieMap.empty[String, (Long, Long, Long)]
    val mem = MemoryStream[QVal]
    val out = QuantileMonitor.runningQuantiles(
      graft.queries.Behavioral.centsBinned(mem.toDF()))
    runWithRestarts(mem, out,
      java.nio.file.Files.createTempDirectory("quant-restart").toString, waves) { r =>
      latest.put(r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))
    }
    val batch = SparkEntry.queries("q108_histogram_quantiles")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(latest.toMap == batch,
      s"restarted stream drained to ${latest.toMap}, batch says $batch")
  }

  test("SourceCap recovers its cap buffers across restarts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text")).as[CapDoc].collect()
    val waves = new scala.util.Random(23).shuffle(docs.toVector)
      .grouped((docs.length / 3) + 1).toSeq
    val latest = TrieMap.empty[String, Seq[(Double, Long)]]
    val mem = MemoryStream[CapDoc]
    val out = SourceCap.runningCap(
      graft.queries.LlmText.qualityScoredDf(mem.toDF())
        .select(col("source"), col("doc_id"), col("score")))
    runWithRestarts(mem, out,
      java.nio.file.Files.createTempDirectory("cap-restart").toString, waves) { r =>
      latest.put(r.getString(0),
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1))))
    }
    val streamed = latest.toSeq.flatMap { case (src, items) =>
      items.zipWithIndex.map { case ((score, docId), i) =>
        (src, i + 1, docId, math.floor(score * 10000 + 0.5) / 10000)
      }
    }.toSet
    val batch = SparkEntry.queries("q98_source_cap")(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"restart cap divergence: missing=${(batch -- streamed).take(3)} " +
        s"extra=${(streamed -- batch).take(3)}")
  }
}
