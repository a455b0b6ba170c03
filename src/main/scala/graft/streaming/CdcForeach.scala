package graft.streaming

import org.apache.spark.sql.{ForeachWriter, Row}

/** Per-event callback sink — the analog of the reference's
  * `Consumer.Process(eventFunc)` (A11, `gomaxscale.go:173-191`):
  * user code runs once per event, failures are isolated per event
  * (the reference `recover()`s panics and logs), and parallelism comes
  * from partitioning rather than caller goroutines.
  *
  * Usage: `df.writeStream.foreach(new CdcForeach(ev => ...)).start()`
  * — optionally `repartition(n)` upstream for n-way callback
  * parallelism (the reference's "N goroutines" mode, with the same
  * ordering trade-off).
  */
final class CdcForeach(
    callback: Row => Unit,
    onError: (Row, Throwable) => Unit = CdcForeach.logAndContinue)
    extends ForeachWriter[Row] {

  override def open(partitionId: Long, epochId: Long): Boolean = true

  override def process(row: Row): Unit =
    try callback(row)
    catch { case t: Throwable => onError(row, t) } // per-event isolation

  override def close(errorOrNull: Throwable): Unit = ()
}

object CdcForeach {
  private def logAndContinue(row: Row, t: Throwable): Unit =
    System.err.println(s"[cdc-foreach] event failed: ${t.getMessage}")
}
