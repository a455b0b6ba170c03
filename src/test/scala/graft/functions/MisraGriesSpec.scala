package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The Misra–Gries guarantee under Spark's actual partial-aggregation
  * path: every item with true frequency > n/k must survive the sketch,
  * for any partitioning (reduce order + merge tree are both exercised by
  * repartitioning the input). */
class MisraGriesSpec extends AnyFunSuite with SparkTestSession {

  // skewed corpus: two genuine heavy hitters over a wide noise tail
  private val tokens: Seq[String] =
    Seq.fill(600)("alpha") ++ Seq.fill(300)("beta") ++
      (0 until 300).map(i => s"noise${i % 150}") ++ Seq.fill(90)("gamma")

  private def heavyHitters(k: Int): Set[String] = {
    val n = tokens.size
    tokens.groupBy(identity).collect {
      case (t, occ) if occ.size.toLong * k > n => t
    }.toSet
  }

  test("sketch contains every item above n/k across partitionings") {
    import spark.implicits._
    for (parts <- Seq(1, 7, 32); k <- Seq(4, 8, 16)) {
      val got = spark.createDataset(tokens).repartition(parts)
        .select(new MisraGries(k).toColumn.name("c")).head().toSet
      val must = heavyHitters(k)
      assert(must.subsetOf(got),
        s"k=$k parts=$parts: missing ${must -- got} (guarantee violated)")
      assert(got.size <= math.min(k - 1, tokens.distinct.size),
        s"k=$k parts=$parts: sketch kept ${got.size} entries")
    }
  }

  test("sketch size never exceeds k-1") {
    import spark.implicits._
    val got = spark.createDataset(tokens).repartition(13)
      .select(new MisraGries(6).toColumn.name("c")).head()
    assert(got.length <= 5, s"sketch size ${got.length} > k-1")
  }

  test("merge is order-insensitive on disjoint skews") {
    // two partitions with different dominant items; the union's heavy
    // hitter set must still be covered
    import spark.implicits._
    val t2 = Seq.fill(500)("x") ++ Seq.fill(500)("y") ++ (0 until 200).map(i => s"z$i")
    val got = spark.createDataset(t2).repartition(2)
      .select(new MisraGries(5).toColumn.name("c")).head().toSet
    assert(Set("x", "y").subsetOf(got))
  }
}
