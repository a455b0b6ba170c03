package graft.plans

import graft.{SparkTestSession, Tables}
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of operator must agree row-for-row with the
  * window-rewrite implementation on the fixture data, and its physical
  * plan must actually be AsOfJoinExec. */
class AsOfJoinNativeSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.01"

  private def viaNative = {
    val ev = Tables(spark, dir, "events")
    val purchases = ev.where(col("event_type") === "purchase")
    val signups = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("s_ts"), col("event_id").as("signup_id"))
    AsOfJoinNative.backward(purchases, signups, Seq("user_id"), "ts", "s_ts", "signup_id")
      .select(col("event_id").as("purchase_id"), col("signup_id"))
      .orderBy(col("purchase_id"))
  }

  test("physical plan uses AsOfJoinExec") {
    val p = viaNative.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), p.take(600))
  }

  test("native as-of equals the window-rewrite implementation") {
    val ev = Tables(spark, dir, "events")
    val purchases = ev.where(col("event_type") === "purchase")
    val signups = ev.where(col("event_type") === "signup")
    val viaWindow = AsOfJoin.backward(purchases, signups, Seq("user_id"), "ts",
        "event_id", Seq("event_id"))
      .select(col("event_id").as("purchase_id"), col("_asof.event_id").as("signup_id"))
      .orderBy(col("purchase_id"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    val native = viaNative
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(native.nonEmpty)
    assert(native == viaWindow)
  }

  test("left rows with no preceding right row keep null match") {
    import spark.implicits._
    val l = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 10L, 12L))
      .toDF("k", "t", "lid")
    val r = Seq((1L, 60L, 20L), (1L, 60L, 21L), (1L, 200L, 22L))
      .toDF("k", "rt", "rid")
    val out = AsOfJoinNative.backward(l, r, Seq("k"), "t", "rt", "rid")
      .select(col("lid"), col("rid")).orderBy(col("lid"))
      .collect().map(row => (row.getLong(0), Option(row.get(1)))).toSeq
    assert(out == Seq(
      (10L, Some(21L)), // ts 100: both rid 20/21 at rt 60 — greatest tie wins
      (11L, None), // ts 50 precedes every right row
      (12L, None))) // key 2 has no right rows
  }

  test("a null right ts is skipped, not a group blocker (merge and broadcast)") {
    import spark.implicits._
    // key 1's right timeline starts with a null ts (sorted NULLS FIRST):
    // the non-null rt 60 row behind it must still match
    val l = Seq((1L, 100L, 10L), (2L, 100L, 11L)).toDF("k", "t", "lid")
    val r = Seq((1L, Option.empty[Long], 19L), (1L, Some(60L), 20L),
        (2L, Option.empty[Long], 29L))
      .toDF("k", "rt", "rid")
    for (bcast <- Seq(false, true)) {
      val out = AsOfJoinNative.backward(l, r, Seq("k"), "t", "rt", "rid",
          broadcastRight = bcast)
        .select(col("lid"), col("rid")).orderBy(col("lid"))
        .collect().map(row => (row.getLong(0), Option(row.get(1)))).toSeq
      assert(out == Seq(
        (10L, Some(20L)), // null-ts rid 19 skipped, rt 60 matches
        (11L, None)), // key 2 has only a null-ts right row
        s"broadcastRight=$bcast")
    }
  }

  test("broadcast variant equals the merge variant on fixture data") {
    val ev = Tables(spark, dir, "events")
    val purchases = ev.where(col("event_type") === "purchase")
    val signups = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("s_ts"), col("event_id").as("signup_id"))
    def run(bcast: Boolean) =
      AsOfJoinNative.backward(purchases, signups, Seq("user_id"), "ts", "s_ts",
          "signup_id", broadcastRight = bcast)
        .select(col("event_id").as("purchase_id"), col("signup_id"))
        .orderBy(col("purchase_id"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    val merge = run(false)
    val bcast = run(true)
    assert(merge.nonEmpty)
    assert(bcast == merge)
  }

  test("both execs collect when they top the codegen stage (no projection above)") {
    // regression: consume() must emit typed column vars, not the raw
    // JoinedRow — a bare collect() of the join output exercises the
    // stage-top path where the framework builds the UnsafeRow
    import spark.implicits._
    val l = Seq((1L, 100L, 10L)).toDF("k", "t", "lid")
    val r = Seq((1L, 60L, 20L)).toDF("k", "rt", "rid")
    for (bcast <- Seq(false, true)) {
      val rows = AsOfJoinNative.backward(l, r, Seq("k"), "t", "rt", "rid",
        broadcastRight = bcast).collect()
      assert(rows.length == 1 && rows.head.getLong(5) == 20L, s"broadcastRight=$bcast")
    }
  }

  test("auto-broadcast picks the broadcast exec from right-side stats when enabled") {
    val ev = Tables(spark, dir, "events")
    val purchases = ev.where(col("event_type") === "purchase")
    val signups = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("s_ts"), col("event_id").as("signup_id"))
    def planStr = AsOfJoinNative.backward(purchases, signups, Seq("user_id"),
      "ts", "s_ts", "signup_id").queryExecution.executedPlan.toString
    // default off: deterministic merge plan
    assert(planStr.contains("AsOfJoin ") && !planStr.contains("AsOfJoinBroadcast"))
    spark.conf.set(AsOfJoinStrategy.AutoBroadcastKey, "true")
    try {
      // fixture signups are far under the broadcast threshold
      assert(planStr.contains("AsOfJoinBroadcast"), planStr.take(800))
      // threshold -1 disables broadcast entirely -> back to merge
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try assert(!planStr.contains("AsOfJoinBroadcast"), planStr.take(800))
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally spark.conf.unset(AsOfJoinStrategy.AutoBroadcastKey)
  }

  test("broadcast variant plans no shuffle or sort on the left side") {
    val ev = Tables(spark, dir, "events")
    val purchases = ev.where(col("event_type") === "purchase")
    val signups = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("s_ts"), col("event_id").as("signup_id"))
    val df = AsOfJoinNative.backward(purchases, signups, Seq("user_id"), "ts",
      "s_ts", "signup_id", broadcastRight = true)
    df.collect() // finalize AQE stages
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoinBroadcast"), p.take(800))
    assert(p.contains("BroadcastExchange"), p.take(800))
    // the ONLY exchange is the right-side broadcast: the fact side must
    // not be hash-partitioned or sorted
    assert(!p.contains("Exchange hashpartitioning"), p.take(800))
    assert(!p.contains("Sort "), p.take(800))
    // and the probe loop is whole-stage codegen'd (the *(n) marker);
    // fallback=false turns a janino failure into a hard error
    assert("""\*\(\d+\) AsOfJoinBroadcast""".r.findFirstIn(p).nonEmpty, p.take(800))
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try assert(df.collect().nonEmpty)
    finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}
