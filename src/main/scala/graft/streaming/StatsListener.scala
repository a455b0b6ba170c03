package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Windowed throughput stats, the Spark-native analog of the reference's
  * stats ticker (`WithStats(period, fn)` — `gomaxscale.go:120-135`,
  * `types.go:200-213`): events/sec and per-batch processing time per
  * progress interval, delivered to a user callback.
  */
final class StatsListener(onStats: StatsListener.Stats => Unit)
    extends StreamingQueryListener {

  val history = new ConcurrentLinkedQueue[StatsListener.Stats]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val s = StatsListener.Stats(
      numberOfEvents = p.numInputRows,
      eventsPerSecond = p.processedRowsPerSecond,
      batchDurationMs = p.batchDuration)
    history.add(s)
    onStats(s)
  }
}

object StatsListener {
  /** Mirror of the reference `Stats` struct (`types.go:200-213`). */
  final case class Stats(numberOfEvents: Long, eventsPerSecond: Double,
      batchDurationMs: Long)
}
