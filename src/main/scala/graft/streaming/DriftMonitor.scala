package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** q107's PSI drift monitor as a STREAMING state machine: per event
  * type, maintain the running (bin, half) count grid over an unbounded
  * event stream and emit the current PSI after every micro-batch — the
  * form a production monitor actually runs, flagging drift the moment
  * it crosses the retrain threshold instead of at the nightly batch.
  * State per type is exactly 20 longs (10 bins × 2 halves) — bytes,
  * watermark-free, independent of stream length. Count accumulation is
  * ADDITION, so arrival order cannot change any final count, and both
  * sides quantize through the same shared fold
  * (`Behavioral.psiE10`) — after ANY shuffled arrival drains, the
  * emitted PSI per type must equal batch q107 bit-for-bit
  * (DriftMonitorSpec). Binning reuses q107's DataFrame expressions
  * (`Behavioral.binnedDrift`), the qualityScoredDf/SourceCap sharing
  * pattern.
  */
object DriftMonitor {

  final case class BinnedEvent(event_type: String, bin: Long, h1: Long)
  final case class DriftState(n1: Seq[Long], n2: Seq[Long])
  final case class DriftOut(event_type: String, psi_e10: Long)

  /** Expects the `Behavioral.binnedDrift` shape (event_type, bin, h1);
    * emits each touched type's current PSI per micro-batch (Update
    * mode). */
  def runningPsi(binned: DataFrame): DataFrame =
    binned.as[BinnedEvent](Encoders.product[BinnedEvent])
      .groupByKey(_.event_type)(Encoders.STRING)
      .mapGroupsWithState[DriftState, DriftOut](GroupStateTimeout.NoTimeout())(
        (ty: String, it: Iterator[BinnedEvent],
            state: org.apache.spark.sql.streaming.GroupState[DriftState]) => {
          val n1 = state.getOption.map(_.n1.toArray).getOrElse(Array.fill(10)(0L))
          val n2 = state.getOption.map(_.n2.toArray).getOrElse(Array.fill(10)(0L))
          it.foreach { e =>
            if (e.h1 == 1L) n1(e.bin.toInt) += 1L else n2(e.bin.toInt) += 1L
          }
          state.update(DriftState(n1.toSeq, n2.toSeq))
          DriftOut(ty, graft.queries.Behavioral.psiE10(n1, n2))
        })(Encoders.product[DriftState], Encoders.product[DriftOut])
      .toDF()
}
