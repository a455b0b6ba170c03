package graft.streaming

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.concurrent.TrieMap

final case class CapDoc(doc_id: Long, source: String, text: String)

/** Stream==batch parity for the per-source cap: feeding the fixture
  * documents through SourceCap.runningCap in shuffled waves must end
  * with exactly the batch q98 caps — the bounded-buffer insert is
  * order-independent, so arrival order (the thing a real stream never
  * controls) cannot change the final cap.
  */
class SourceCapSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("streaming running cap drains to the batch q98 result under shuffled arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[CapDoc].collect()
    // deterministic shuffle, nothing like source or id order
    val shuffled = new scala.util.Random(42).shuffle(docs.toVector)
    val waves = shuffled.grouped((shuffled.size / 3) + 1).toSeq

    val latest = TrieMap.empty[String, Seq[(Double, Long)]]
    val mem = MemoryStream[CapDoc]
    val scored = graft.queries.LlmText.qualityScoredDf(mem.toDF())
      .select(col("source"), col("doc_id"), col("score"))
    val q = SourceCap.runningCap(scored)
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          latest.put(r.getString(0),
            r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1))))
        }
      }
      .start()
    try {
      waves.foreach { w =>
        mem.addData(w: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // project the final buffers into q98's output shape
    val streamed = latest.toSeq.flatMap { case (src, items) =>
      items.zipWithIndex.map { case ((score, docId), i) =>
        (src, i + 1, docId, math.floor(score * 10000 + 0.5) / 10000)
      }
    }.toSet
    val batch = SparkEntry.queries("q98_source_cap")(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream/batch cap divergence: missing=${(batch -- streamed).take(3)} " +
        s"extra=${(streamed -- batch).take(3)}")
  }
}
