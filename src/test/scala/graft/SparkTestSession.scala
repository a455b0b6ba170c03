package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** Shared local SparkSession for specs (UTC, small shuffle fan-out). */
trait SparkTestSession extends BeforeAndAfterAll { self: Suite =>

  lazy val spark: SparkSession = SparkTestSession.session

  override protected def beforeAll(): Unit = {
    // pin the shared session as the suite thread's ACTIVE session:
    // getOrCreate() set it only on the thread that first built the
    // session, and a test-framework thread created before that carries
    // an empty InheritableThreadLocal — any plan it forces outside a
    // Spark-guarded action is then built with a null session (the
    // r14 driver-flaked WidenMigrationSpec NPE; see graft.util.Sessions)
    SparkSession.setActiveSession(spark)
    super.beforeAll()
  }

  override protected def afterAll(): Unit = super.afterAll()
}

object SparkTestSession {
  lazy val session: SparkSession = {
    val builder = SparkSession.builder()
      // local[threads, maxFailures]: 2 task attempts, so the suite can
      // drill TASK-RETRY idempotence (TaskRetrySpec) — the failure mode
      // that is CONSTANT on a 1000-executor cluster and that batch-
      // replay drills alone cannot reach. Fail-fast specs are
      // unaffected: a deterministic task error fails its retry too and
      // surfaces the same wrapped exception, one attempt later.
      .master("local[4,2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    // one planner configuration for the whole session (see Bench)
    graft.operators.BucketedTables.sessionConfs
      .foreach { case (k, v) => builder.config(k, v) }
    val s = builder.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
