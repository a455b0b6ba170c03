package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

final case class WMeanBuf(var weightedSum: Double, var weight: Double)

/** Typed UDAF via `Aggregator[IN, BUF, OUT]` — the declared UDAF surface
  * of SURVEY.md §2C (reference analog: the single `func(CDCEvent)`
  * callback is the only user-code hook, A11). Weighted arithmetic mean:
  * `reduce` folds (value, weight) pairs into a partial buffer and
  * `merge` is associative+commutative, so Spark runs it with map-side
  * partial aggregation exactly like a built-in — at 100 TB the shuffle
  * carries one 16-byte buffer per group per task, not rows.
  */
object WeightedMean extends Aggregator[(Double, Double), WMeanBuf, Double] {
  override def zero: WMeanBuf = WMeanBuf(0.0, 0.0)
  override def reduce(b: WMeanBuf, a: (Double, Double)): WMeanBuf = {
    b.weightedSum += a._1 * a._2; b.weight += a._2; b
  }
  override def merge(x: WMeanBuf, y: WMeanBuf): WMeanBuf = {
    x.weightedSum += y.weightedSum; x.weight += y.weight; x
  }
  override def finish(b: WMeanBuf): Double =
    if (b.weight == 0.0) Double.NaN else b.weightedSum / b.weight
  override def bufferEncoder: Encoder[WMeanBuf] = Encoders.product[WMeanBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
