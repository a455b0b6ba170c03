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
  def withShufflePartitions[T](s: SparkSession, n: Int)(f: => T): T =
    withConf(s, "spark.sql.shuffle.partitions", n.toString)(f)

  /** Shuffle-partition count for MICRO-BATCH work (the r13/r14 q66
    * doctrine generalized to every streaming-twin / wire-drill entry):
    * a micro-batch's shuffle volume is bounded by the batch, not the
    * corpus, so partitions are sized to the batch — parameterized
    * (`SPARK_GRAFT_MICROBATCH_PARTITIONS`) because the right value is
    * a property of per-batch volume, not of this host: a production
    * deployment ingesting bigger batches raises it (the usual
    * bytes-per-partition rule, guide §2.2), while the fixture-scale
    * waves here (10⁴–10⁵ rows) are pure task/AQE-planning overhead
    * beyond a handful of partitions. Results are partitioning-
    * invariant — every consumer is held to its DuckDB oracle hash. */
  val MicroBatchPartitions: Int = {
    val n = sys.env.get("SPARK_GRAFT_MICROBATCH_PARTITIONS").map { v =>
      // ADVICE r14: a typo'd value must fail with the variable named,
      // not an opaque NumberFormatException from a static initializer
      v.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"SPARK_GRAFT_MICROBATCH_PARTITIONS must be a positive int, got '$v'"))
    }.getOrElse(8)
    require(n >= 1, s"SPARK_GRAFT_MICROBATCH_PARTITIONS must be >= 1, got $n")
    n
  }

  /** Scoped [[withShufflePartitions]] at [[MicroBatchPartitions]] — the
    * wrapper every micro-batch-cadence entry runs its eager work under
    * (stream starts capture the conf into the cloned session; emission
    * folds/checkpoint rounds execute inside the wrap). */
  def withMicroBatch[T](s: SparkSession)(f: => T): T =
    withShufflePartitions(s, MicroBatchPartitions)(f)

  /** Scoped session-conf override of one arbitrary key — same
    * restore-or-unset contract as [[withShufflePartitions]]. */
  def withConf[T](s: SparkSession, key: String, value: String)(f: => T): T = {
    val prev = s.conf.getOption(key)
    s.conf.set(key, value)
    try f finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
}
