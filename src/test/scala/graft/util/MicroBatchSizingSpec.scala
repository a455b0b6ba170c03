package graft.util

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the self-sizing micro-batch partition function (VERDICT r14
  * item 6): partitions follow OBSERVED batch volume, clamped to
  * [4, ambient shuffle partitions] — so fixture-scale waves reproduce
  * the former static-8 plans under the withMicroBatch wrap, while an
  * unwrapped production session sizes by volume with no env knob. */
class MicroBatchSizingSpec extends AnyFunSuite with SparkTestSession {

  private def sized(ambient: Int, rows: Long): Int =
    Confs.withShufflePartitions(spark, ambient) {
      Confs.microBatchPartitionsFor(spark, rows)
    }

  test("fixture-scale wave under the micro-batch wrap keeps the static plans") {
    // sf0.1 q66 wave = 2500 docs; ambient inside withMicroBatch = 8
    assert(sized(Confs.MicroBatchPartitions, 2500) ===
      Confs.MicroBatchPartitions)
    // the whole sf0.1 corpus in one batch still caps at the wrap value
    assert(sized(Confs.MicroBatchPartitions, 5000) ===
      Confs.MicroBatchPartitions)
  }

  test("small batches size down by volume, floored at 4") {
    assert(sized(200, 1) === 4)
    assert(sized(200, 4 * Confs.MicroBatchRowsPerPartition) === 4)
    assert(sized(200, 10 * Confs.MicroBatchRowsPerPartition) === 10)
    // ceil, not floor: one row over a boundary adds a partition
    assert(sized(200, 10 * Confs.MicroBatchRowsPerPartition + 1) === 11)
  }

  test("big batches keep the ambient session default (the 100 TB shape)") {
    assert(sized(200, 1000000) === 200)
  }

  test("unknown row count keeps the ambient value") {
    assert(sized(8, -1) === 8)
    assert(sized(200, 0) === 200)
  }
}
