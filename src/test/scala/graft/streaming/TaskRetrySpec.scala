package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** TASK-attempt retry drills: on a 1000-executor cluster, individual
  * task failures (preemption, OOM-kill, node loss) are CONSTANT, and
  * Spark's answer is per-task retry under the output-commit protocol —
  * a failed write attempt's files are never visible, the retried
  * attempt's are committed once. The batch-replay drills elsewhere
  * re-run a WHOLE batch; these drills fail a SINGLE task attempt
  * mid-write (the session runs `local[4,2]`, so attempt 0 can throw
  * and attempt 1 succeed) and pin that the durable state is exactly
  * what a failure-free run produces.
  *
  * The injection is a UDF that throws on (attemptNumber == 0,
  * partition 0) — deterministic, and it fires in EVERY job that scans
  * the frame, so multi-job paths (append + sidecar + snapshot merge)
  * each survive their own retry. Inputs are RDD-backed on purpose:
  * over a LocalRelation, Catalyst's ConvertToLocalRelation evaluates
  * the projection ON THE DRIVER (no TaskContext), silently skipping
  * the injection — the assertInjected guard exists because exactly
  * that produced a vacuous first draft of this spec.
  */
class TaskRetrySpec extends AnyFunSuite with SparkTestSession {

  private def failOnce = udf { (id: Long) =>
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null && tc.attemptNumber() == 0 && tc.partitionId() == 0) {
      TaskRetrySpec.injections.incrementAndGet()
      throw new RuntimeException("injected task failure (attempt 0)")
    }
    id
  }

  /** Guard against a vacuous pass: if column pruning (or a partition
    * layout change) ever stops the injected UDF from running on
    * (attempt 0, partition 0), the drill must fail loudly, not pass
    * without having drilled anything. */
  private def assertInjected[T](body: => T): T = {
    val before = TaskRetrySpec.injections.get()
    val r = body
    assert(TaskRetrySpec.injections.get() > before,
      "the task-failure injection never fired — the drill is vacuous")
    r
  }

  private def tmp(p: String) = graft.util.Scratch.dir(p)

  test("StateLayout.append commits exactly once under a task-attempt failure") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("v", LongType)))
    val rows = spark.sparkContext
      .parallelize((0L until 2000L).map(i => (i, i * 7)), 4)
      .toDF("doc_id", "v")

    val cleanDir = tmp("retry-clean")
    StateLayout.append(rows, cleanDir, Seq("doc_id"))
    val want = StateLayout.read(spark, cleanDir, schema)
      .collect().map(_.toSeq).toSet

    val dir = tmp("retry-inject")
    val injected = rows.withColumn("doc_id", failOnce(col("doc_id")))
    assertInjected { StateLayout.append(injected, dir, Seq("doc_id")) }
    val got = StateLayout.read(spark, dir, schema).collect().map(_.toSeq).toSet
    assert(got == want,
      "task-retry append diverged from the failure-free append")
    // the failed attempt's files must not linger as committed parquet
    assert(StateFiles.parquetCount(dir) <= StateLayout.NumBuckets)
  }

  test("CdcSnapshotTable.applyBatch is exact under a task-attempt failure") {
    import spark.implicits._
    val payload = StructType(Seq(StructField("custkey", LongType),
      StructField("cents", LongType)))
    def cdc(rows: Seq[(String, Long, Long, Long, Long)]) =
      spark.sparkContext.parallelize(rows, 2)
        .toDF("op", "sequence", "event_number", "custkey", "cents")
    val batch0 = cdc((1L to 500L).map(k => ("insert", k, 1L, k, k * 100)))
    val batch1 = cdc(Seq(("delete", 501L, 1L, 7L, 0L),
      ("insert", 502L, 1L, 1000L, 42L)))

    def run(inject: Boolean): Set[Seq[Any]] = {
      val snap = new CdcSnapshotTable(tmp("retry-snap"), Seq("custkey"), payload)
      def maybe(df: org.apache.spark.sql.DataFrame) =
        if (inject) df.withColumn("custkey", failOnce(col("custkey"))) else df
      snap.applyBatch(maybe(batch0), 0L)
      snap.applyBatch(maybe(batch1), 1L)
      snap.snapshot(spark).collect().map(_.toSeq).toSet
    }
    val clean = run(inject = false)
    val retried = assertInjected { run(inject = true) }
    assert(retried == clean,
      "task-retry snapshot diverged from the failure-free snapshot")
    assert(clean.exists(_.head == 1000L) && !clean.exists(_.head == 7L))
  }

  test("IncrementalLineDedup output is exact when a batch's tasks retried") {
    import spark.implicits._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).limit(300)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    def emit(inject: Boolean): Seq[Seq[Any]] = {
      val inc = new IncrementalLineDedup(tmp("retry-dedup"))
      docs.grouped(100).zipWithIndex.foreach { case (w, i) =>
        val batch = spark.sparkContext.parallelize(w, 2).toDF("doc_id", "text")
        val fed = if (inject)
          batch.withColumn("doc_id", failOnce(col("doc_id"))) else batch
        inc.processBatch(fed, i.toLong)
      }
      inc.lines(spark).orderBy("doc_id").collect().map(_.toSeq).toSeq
    }
    val clean = emit(inject = false)
    val retried = assertInjected { emit(inject = true) }
    assert(retried.nonEmpty && retried == clean,
      "task-retry dedup emission diverged from the failure-free run")
  }
}

object TaskRetrySpec {
  /** Times the injected UDF threw (static: tasks share the JVM in
    * local mode). */
  val injections = new java.util.concurrent.atomic.AtomicInteger
}
