package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join (Spark has no native ASOF; SURVEY.md §4.2).
  *
  * For each left row, finds the latest right row with `rightTs <= leftTs`
  * in the same key group, ties broken by the largest `tie` value.
  *
  * Implementation is a union + running `last(_, ignoreNulls)` window
  * rather than a range join: one shuffle on the key, a single sorted pass
  * per key timeline, no pair explosion. At 100 TB this is the only shape
  * that survives skewed keys — a theta-join `r.ts <= l.ts` would build
  * O(n·m) candidates per key before pruning; here cost is O(n+m) per key
  * and the sort rides the existing shuffle.
  */
object AsOfJoin {

  /** @param payload right-side columns to surface (as a struct `_asof`,
    *                null when no right row precedes the left row). */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, tie: String, payload: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    // a null right ts can never satisfy rightTs <= leftTs (SQL comparison
    // semantics); unfiltered it would sort NULLS FIRST and be picked up
    // by the running last() for every later left row — drop up front
    // (matches the native merge/broadcast execs, AsOfDifferentialSpec)
    val rSel = right.where(col(ts).isNotNull).select(
      keyCols ++ Seq(col(ts), lit(0).as("_side"), col(tie).cast("long").as("_tie"),
        struct(payload.map(col): _*).as("_r")): _*)
    val lSel = left.select(
      keyCols ++ Seq(col(ts), lit(1).as("_side"), col(tie).cast("long").as("_tie"),
        lit(null).cast(rSel.schema("_r").dataType).as("_r"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("_l")): _*)
    val rAll = rSel.withColumn("_l", lit(null).cast(lSel.schema("_l").dataType))
    // Right rows sort before left rows at equal ts (`_side` asc) → the
    // running frame sees ts-equal right rows, giving `<=` semantics.
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(ts).asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSel.unionByName(rAll)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(col("_l.*"), col("_asof"))
  }

  /** Q12: each purchase event matched to the same user's latest
    * not-later signup event. */
  def defs: Seq[QueryDef] = Seq(
    QueryDef("q12_asof_join",
      (s, d) => {
        val ev = Tables(s, d, "events")
        val purchases = ev.where(col("event_type") === "purchase")
        val signups = ev.where(col("event_type") === "signup")
        backward(purchases, signups, Seq("user_id"), "ts", "event_id", Seq("event_id"))
          .select(col("event_id").as("purchase_id"), col("_asof.event_id").as("signup_id"))
          .orderBy(col("purchase_id"))
      },
      Some(AsOfOracleSql)),

    QueryDef("q12b_asof_native",
      // same semantics through the custom LogicalPlan/Strategy/SparkPlan
      // operator (graft.plans.AsOfJoinNative) — one sorted merge per key
      // partition instead of the union+window rewrite
      (s, d) => {
        val ev = Tables(s, d, "events")
        val purchases = ev.where(col("event_type") === "purchase")
        val signups = ev.where(col("event_type") === "signup")
          .select(col("user_id"), col("ts").as("s_ts"), col("event_id").as("signup_id"))
        graft.plans.AsOfJoinNative
          .backward(purchases, signups, Seq("user_id"), "ts", "s_ts", "signup_id")
          .select(col("event_id").as("purchase_id"), col("signup_id"))
          .orderBy(col("purchase_id"))
      },
      Some(AsOfOracleSql)),

    QueryDef("q12c_asof_broadcast",
      // same semantics again through the BROADCAST variant
      // (plans/AsOfJoinBroadcastExec): the signup side is broadcast and
      // each purchase row does a hash lookup + binary search — no
      // shuffle or sort of the purchase side at all, the shape for
      // dimension-history (SCD) lookups where the fact side is 100 TB
      (s, d) => {
        val ev = Tables(s, d, "events")
        val purchases = ev.where(col("event_type") === "purchase")
        val signups = ev.where(col("event_type") === "signup")
          .select(col("user_id"), col("ts").as("s_ts"), col("event_id").as("signup_id"))
        graft.plans.AsOfJoinNative
          .backward(purchases, signups, Seq("user_id"), "ts", "s_ts", "signup_id",
            broadcastRight = true)
          .select(col("event_id").as("purchase_id"), col("signup_id"))
          .orderBy(col("purchase_id"))
      },
      Some(AsOfOracleSql)))

  private val AsOfOracleSql: String =
    "SELECT p.event_id AS purchase_id, " +
      "(SELECT s.event_id FROM events s WHERE s.user_id = p.user_id " +
      "AND s.event_type = 'signup' AND s.ts <= p.ts " +
      "ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS signup_id " +
      "FROM events p WHERE p.event_type = 'purchase' ORDER BY purchase_id"
}
