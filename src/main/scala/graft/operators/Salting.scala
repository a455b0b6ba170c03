package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (PLAN_NOTES.md "Joins at 100 TB").
  *
  * AQE's skew-join split handles skewed *joins* automatically, but a
  * skewed *aggregation* key still funnels one key's rows into one task.
  * [[salted]] is the standard two-phase rewrite: shuffle once on
  * (key, salt) so a hot key spreads over `buckets` tasks, then combine
  * the partials with a second (tiny) shuffle on the key alone. Works for
  * any algebraic aggregate expressible as partial + merge.
  */
object Salting {

  /** Deterministic uniform salt in [0, buckets), hashed from any
    * high-cardinality column mix. */
  def saltColumn(buckets: Int, entropy: Seq[Column]): Column =
    pmod(hash(entropy: _*), lit(buckets))

  /** Two-phase salted aggregation. `partialAggs` aggregate the salted
    * (key, salt) groups; `finalAggs` merge those partial columns per
    * key (reference the partial aliases). */
  def salted(df: DataFrame, key: Seq[String], buckets: Int, entropy: Seq[Column],
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame =
    df.withColumn("_salt", saltColumn(buckets, entropy))
      .groupBy((key.map(col) :+ col("_salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(key.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)

  /** Concrete common case: count + sum of one column per key. */
  def saltedCountSum(df: DataFrame, key: Seq[String], valueCol: String,
      buckets: Int, entropy: Seq[Column]): DataFrame =
    salted(df, key, buckets, entropy,
      partialAggs = Seq(count(lit(1)).as("cnt"), sum(col(valueCol)).as("sum")),
      finalAggs = Seq(sum(col("cnt")).as("cnt"), sum(col("sum")).as("sum")))
}
