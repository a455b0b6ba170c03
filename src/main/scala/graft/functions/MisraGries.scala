package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

final case class MgBuf(var m: Map[String, Long])

/** Misra–Gries frequent-items sketch as a typed `Aggregator` — the
  * mergeable-summary answer to "which tokens exceed n/k of a 100 TB
  * corpus" without a full-vocabulary shuffle (the reference has no
  * aggregation at all; this is part of the §2C UDAF surface alongside
  * [[WeightedMean]]).
  *
  * State is at most k-1 counters. `reduce` is the classic streaming
  * update (hit → +1; free slot → insert; else decrement every counter);
  * `merge` sums two sketches and subtracts the k-th largest count from
  * all (Agarwal et al., "Mergeable Summaries", PODS'12), preserving the
  * guarantee: any item with true frequency > n/k SURVIVES in the sketch,
  * and every estimate undercounts by at most n/k. Spark runs it with
  * map-side partial aggregation, so the shuffle carries one ≤(k-1)-entry
  * map per task — the exact two-pass heavy-hitter recipe: sketch for
  * candidates, then re-count only candidates exactly (q62).
  */
final class MisraGries(k: Int) extends Aggregator[String, MgBuf, Array[String]] {
  require(k >= 2, "k must be >= 2")

  override def zero: MgBuf = MgBuf(Map.empty)

  override def reduce(b: MgBuf, tok: String): MgBuf = {
    val m = b.m
    m.get(tok) match {
      case Some(c) => b.m = m.updated(tok, c + 1)
      case None if m.size < k - 1 => b.m = m.updated(tok, 1L)
      case None => b.m = m.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }
    b
  }

  override def merge(x: MgBuf, y: MgBuf): MgBuf = {
    val sum = (x.m.keySet ++ y.m.keySet).iterator
      .map(t => t -> (x.m.getOrElse(t, 0L) + y.m.getOrElse(t, 0L))).toMap
    x.m =
      if (sum.size <= k - 1) sum
      else {
        val kth = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k - 1)
        sum.collect { case (t, c) if c > kth => t -> (c - kth) }
      }
    x
  }

  override def finish(b: MgBuf): Array[String] = b.m.keys.toArray.sorted

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[Array[String]] = ExpressionEncoder[Array[String]]()
}
