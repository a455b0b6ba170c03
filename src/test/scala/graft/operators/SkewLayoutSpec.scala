package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two round-6 layout/movement operators hold their contracts:
  * SaltedJoin may change MOVEMENT but never the relation (and must
  * actually spread each key over multiple salts, or it is a plain join
  * with extra columns), and PartitionedEvents must lay events out one
  * partition per day (the unit dynamic partition pruning skips by).
  */
class SkewLayoutSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("salted inner join equals the plain inner join") {
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("user_id"))
    val dim = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_type"))
    val plain = ev.join(dim, Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("user_id"), col("n_type"))
      .collect().map(_.toSeq).toSet
    val salted = SaltedJoin.inner(ev, dim, "event_type", col("event_id"), salts = 8)
      .select(col("event_id"), col("event_type"), col("user_id"), col("n_type"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain, s"salting changed the relation: " +
      s"missing=${(plain -- salted).take(3)} extra=${(salted -- plain).take(3)}")
  }

  test("the salt spreads every hot key over multiple sub-keys") {
    val ev = Tables(spark, dir, "events").select(col("event_id"), col("event_type"))
    val salted = ev.withColumn("__salt",
      pmod(xxhash64(col("event_id")), lit(8L)).cast("int"))
    val spread = salted.groupBy(col("event_type"))
      .agg(countDistinct(col("__salt")).as("n_salts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spread.nonEmpty)
    spread.foreach { case (k, n) =>
      assert(n == 8L, s"key $k landed on $n of 8 salts — skew not spread")
    }
  }

  test("PartitionedEvents writes one partition per event day") {
    val tbl = PartitionedEvents.ensure(spark, dir)
    val parts = spark.sql(s"SHOW PARTITIONS `$tbl`").count()
    val days = Tables(spark, dir, "events")
      .select(to_date(col("ts")).as("d")).distinct().count()
    assert(parts == days, s"$parts partition dirs vs $days event days")
    // and the partition column round-trips as a DATE, so the q102 join
    // key matches the dim side without a cast
    assert(spark.table(tbl).schema("d").dataType ==
      org.apache.spark.sql.types.DateType)
  }
}
