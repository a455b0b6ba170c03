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

  /** Whether ADAPTIVE execution stays on inside [[withMicroBatchExec]]
    * (default off): AQE earns its keep by re-sizing big unknown
    * shuffles and re-picking join strategies at runtime, but a
    * micro-batch's shuffles are already statically sized to the batch
    * — what remains of AQE at that volume is its cost: one
    * driver-scheduled JOB plus a re-optimization pass per query stage,
    * at micro-batch cadence. Interleaved same-JVM A/B on this host
    * (graft.BenchAb, min-of-3 per arm): q66 6.47→4.55 s, q66b
    * 6.61→4.77, qc7 6.10→5.40 with AQE off across the whole entry —
    * while the maintenance entries' CORPUS-scale window work (qc12–14
    * migrations/rebuild) measured 14–17% BETTER with AQE on, which is
    * why the off-scope is the per-batch HOOKS and the CC iterations,
    * not whole entries. Env-overridable because the right answer
    * follows batch volume: a deployment running big micro-batches sets
    * SPARK_GRAFT_MICROBATCH_AQE=on alongside a bigger partition count.
    * Results are planner-invariant — the oracle hash is the gate. */
  val MicroBatchAqe: Boolean =
    sys.env.get("SPARK_GRAFT_MICROBATCH_AQE") match {
      case None => false
      case Some("on") => true
      case Some("off") => false
      case Some(v) => throw new IllegalArgumentException(
        s"SPARK_GRAFT_MICROBATCH_AQE must be 'on' or 'off', got '$v'")
    }

  /** Test-only hook so an A/B harness can interleave both AQE arms in
    * ONE JVM (same host-noise exposure per arm); None = [[MicroBatchAqe]]. */
  @volatile private[graft] var microBatchAqeOverride: Option[Boolean] = None

  /** Rows-per-partition for SELF-SIZED micro-batches (VERDICT r14
    * item 6 — guide §2.2's volume-follows-partitions rule expressed on
    * the one number a batch hook learns for free, its checkpointed row
    * count; rows stand in for bytes at the documented fixture row
    * width, a few KB of text per doc). 256 is chosen so the sf0.1
    * fixture wave (2 500 docs) sizes to ≥ 8 — the same plans the
    * static default produced — while staying small enough that a
    * 10⁶-row production batch under a 200-partition session default
    * self-sizes to the full default instead of a constant. */
  val MicroBatchRowsPerPartition = 256

  /** Partition count for ONE micro-batch of `rows` rows: volume-based,
    * clamped to [4, ambient shuffle partitions]. Inside a
    * [[withMicroBatch]] wrap the ambient ceiling is
    * [[MicroBatchPartitions]], so fixture-scale waves keep today's
    * plans; on an UNWRAPPED session (production hooks at the cluster
    * default) small batches size down by volume and big batches keep
    * the cluster default — the 100 TB contract no longer depends on
    * the env knob. `rows <= 0` (unknown) keeps the ambient value. */
  def microBatchPartitionsFor(s: SparkSession, rows: Long): Int = {
    val ambient = s.conf.get("spark.sql.shuffle.partitions").toIntOption
      .getOrElse(MicroBatchPartitions)
    if (rows <= 0) ambient
    else {
      val byVolume = (rows + MicroBatchRowsPerPartition - 1) /
        MicroBatchRowsPerPartition
      math.min(ambient.toLong, math.max(4L, byVolume)).toInt
    }
  }

  /** Scoped [[withShufflePartitions]] at [[MicroBatchPartitions]] — the
    * wrapper every micro-batch-cadence entry runs its eager work under
    * (stream starts capture the conf into the cloned session; emission
    * folds/checkpoint rounds execute inside the wrap). AQE is NOT
    * scoped here: entry bodies mix micro-batch hooks with corpus-scale
    * maintenance windows, and the A/B says those want opposite
    * settings — the hooks and CC iterations scope it themselves via
    * [[withMicroBatchExec]]. */
  def withMicroBatch[T](s: SparkSession)(f: => T): T =
    withShufflePartitions(s, MicroBatchPartitions)(f)

  /** The EXECUTION-scope wrapper for work that is provably micro-batch
    * sized (a state hook's one batch, a CC round over a bounded pair
    * delta): adaptive execution per [[MicroBatchAqe]] (default off —
    * static tiny plans schedule one job per action instead of one per
    * query stage). Corpus-scale work (migrations, bootstrap passes,
    * emission folds over accumulated state) must NOT run under this —
    * it keeps the session's AQE. */
  def withMicroBatchExec[T](s: SparkSession)(f: => T): T =
    withConf(s, "spark.sql.adaptive.enabled",
      microBatchAqeOverride.getOrElse(MicroBatchAqe).toString)(f)

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
