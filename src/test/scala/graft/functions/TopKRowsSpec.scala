package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The bounded top-k Aggregator must be a pure function of the input
  * multiset: identical to the sort-based answer and independent of how
  * rows are partitioned (merge is associative + commutative). */
class TopKRowsSpec extends AnyFunSuite with SparkTestSession {

  private def refTopK(rows: Seq[(Double, Long, Long)], k: Int): Seq[(Double, Long, Long)] =
    rows.sortBy { case (s, a, b) => (-s, a, b) }.take(k)

  test("agrees with the sort-based reference and is partition-invariant") {
    import spark.implicits._
    val rnd = new Random(42)
    // duplicate scores on purpose — the id tiebreaker must decide
    val rows = Seq.fill(500)((rnd.nextInt(40).toDouble, rnd.nextInt(100).toLong, rnd.nextInt(10).toLong))
    val expected = refTopK(rows, 5)
    val topk = udaf(new TopKRows(5),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    for (parts <- Seq(1, 3, 16)) {
      val got = rows.toDF("s", "a", "b").repartition(parts)
        .agg(topk(col("s"), col("a"), col("b")).as("top"))
        .select(explode(col("top")).as("e"))
        .select(col("e._1"), col("e._2"), col("e._3"))
        .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expected, s"parts=$parts: $got != $expected")
    }
  }

  test("buffer never exceeds k entries under reduce/merge") {
    val agg = new TopKRows(3)
    var buf = agg.zero
    val rnd = new Random(7)
    (1 to 200).foreach { i =>
      buf = agg.reduce(buf, (rnd.nextInt(20).toDouble, i.toLong, 0L))
      assert(buf.items.size <= 3)
    }
    val other = (1 to 50).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, (rnd.nextInt(20).toDouble, (1000 + i).toLong, 1L)))
    val merged = agg.merge(buf, other)
    assert(merged.items.size <= 3)
    assert(merged.items == merged.items.sortBy { case (s, a, b) => (-s, a, b) })
  }
}
