package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** q108's histogram quantiles as a STREAMING state machine — the third
  * monitoring twin next to DriftMonitor (PSI) and SourceCap (caps):
  * per event type, maintain the running cent-bin histogram over an
  * unbounded stream and emit the current p50/p95/p99 after every
  * micro-batch. This is exactly why the histogram beats exact
  * percentiles at scale: bins MERGE by addition, so the incremental
  * update is += on a ≤ ~50-entry map, watermark-free, independent of
  * stream length — an exact-percentile twin would re-sort history
  * every batch. Binning and the quantile rule are the SHARED
  * Behavioral helpers (centsBinned / histQuantiles), so after ANY
  * shuffled arrival drains, the emitted quantiles equal batch q108
  * bit-for-bit (QuantileMonitorSpec).
  */
object QuantileMonitor {

  final case class BinnedValue(event_type: String, bin: Long)
  final case class HistState(bins: Map[Long, Long])
  final case class QuantOut(event_type: String, p50_cents: Long,
      p95_cents: Long, p99_cents: Long)

  /** Expects the `Behavioral.centsBinned` shape (event_type, bin);
    * emits each touched type's current quantiles per micro-batch
    * (Update mode). */
  def runningQuantiles(binned: DataFrame): DataFrame =
    binned.as[BinnedValue](Encoders.product[BinnedValue])
      .groupByKey(_.event_type)(Encoders.STRING)
      .mapGroupsWithState[HistState, QuantOut](GroupStateTimeout.NoTimeout())(
        (ty: String, it: Iterator[BinnedValue],
            state: org.apache.spark.sql.streaming.GroupState[HistState]) => {
          var bins = state.getOption.map(_.bins).getOrElse(Map.empty[Long, Long])
          it.foreach(v => bins = bins.updated(v.bin, bins.getOrElse(v.bin, 0L) + 1L))
          state.update(HistState(bins))
          val (p50, p95, p99) = graft.queries.Behavioral.histQuantiles(bins)
          QuantOut(ty, p50, p95, p99)
        })(Encoders.product[HistState], Encoders.product[QuantOut])
      .toDF()
}
