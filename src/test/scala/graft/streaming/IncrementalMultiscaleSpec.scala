package graft.streaming

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** q112bs_incremental_multiscale_spans: three independent per-n
  * incremental states must reproduce batch q112b's long-format
  * multi-resolution statistic row-for-row (stream==batch, and the
  * per-resolution states compose without cross-talk). */
class IncrementalMultiscaleSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def collect(name: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, dir).collect().map(_.toSeq.toList).toSeq

  test("streamed multi-resolution spans equal batch q112b row-for-row") {
    val batch = collect("q112b_multiscale_dup_spans")
    assert(batch.nonEmpty)
    assert(batch.map(_(1)).distinct.size == 3, "batch lost a resolution")
    val streamed = collect("q112bs_incremental_multiscale_spans")
    assert(streamed == batch)
  }
}
