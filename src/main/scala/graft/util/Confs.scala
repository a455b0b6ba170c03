package graft.util

import org.apache.spark.sql.SparkSession

/** Scoped session-conf overrides. Spark's `spark.sql.shuffle.partitions`
  * is a session knob, but the right value is a property of the WORK: a
  * fixture-scale micro-batch (tens of thousands of rows per wave)
  * scheduled at 32 partitions pays ~4× the task/AQE-planning overhead
  * of the same plan at 8, with identical results (measured on the q66
  * family: warm waves 3.4–9.9 s at 32 → 2.2–4.6 s at 8; the per-wave
  * job-time SUM is micro-jobs + parquet-commit fixed costs, so task
  * count is the lever that's actually free). The production analog is
  * standard practice: size shuffle partitions to the micro-batch, not
  * to the cluster default — a 100 TB batch run keeps the big default,
  * a foreachBatch state update sizes down. Restores the previous value
  * (or unsets) on exit, exception-safe. */
object Confs {
  def withShufflePartitions[T](s: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.getOption(key)
    s.conf.set(key, n.toString)
    try f finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
}
