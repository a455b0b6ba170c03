package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Fixture-independent property checks for the round-6 operators:
  * each is pinned against a driver-side reference implementation over
  * seeded-random inputs (3 seeds each), so correctness does not hinge
  * on whatever shapes the parquet fixtures happen to contain —
  * adversarial skew, duplicate points, and disconnected graphs are all
  * generated here on purpose.
  */
class OperatorPropertySpec extends AnyFunSuite with SparkTestSession {

  test("SaltedJoin.inner equals the plain join on skewed random data") {
    import spark.implicits._
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new Random(seed)
      // deliberately brutal skew: 90% of facts on one key
      val keys = Seq("hot", "warm", "cold")
      val fact = (1L to 500L).map { id =>
        val k = if (rnd.nextDouble() < 0.9) "hot" else keys(rnd.nextInt(3))
        (id, k, rnd.nextInt(1000))
      }.toDF("id", "k", "v")
      val dim = keys.map(k => (k, k.length)).toDF("k", "klen")
      val plain = fact.join(dim, Seq("k"))
        .select("id", "k", "v", "klen").collect().map(_.toSeq).toSet
      val salted = SaltedJoin.inner(fact, dim, "k", col("id"), salts = 4)
        .select("id", "k", "v", "klen").collect().map(_.toSeq).toSet
      assert(salted == plain, s"seed $seed: salted != plain")
    }
  }

  test("two-phase bucketed skyline equals brute-force dominance on random points") {
    import spark.implicits._
    for (seed <- Seq(7, 8, 9)) {
      val rnd = new Random(seed)
      // small value range forces duplicates and ties on both axes
      val pts = (1 to 400).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .distinct
      val brute = pts.filter(p => !pts.exists(q =>
        q._1 <= p._1 && q._2 >= p._2 && (q._1 < p._1 || q._2 > p._2))).toSet
      val df = pts.toDF("cost_cents", "qty")
      def skyline(in: org.apache.spark.sql.DataFrame, part: Seq[String]) = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(part.map(col): _*)
          .orderBy(col("cost_cents").asc, col("qty").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        in.withColumn("__m", max(col("qty")).over(w))
          .where(col("__m").isNull || col("qty") > col("__m")).drop("__m")
      }
      val local = skyline(df.withColumn("__bk",
        pmod(xxhash64(col("cost_cents"), col("qty")), lit(8L))), Seq("__bk")).drop("__bk")
      val got = skyline(local.withColumn("__g", lit(1)), Seq("__g")).drop("__g")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute, s"seed $seed: skyline mismatch " +
        s"missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
    }
  }

  test("KCorePeel matches an imperative reference peel on random graphs") {
    import spark.implicits._
    for (seed <- Seq(11, 12)) {
      val rnd = new Random(seed)
      // sparse random graph over 60 vertices; k chosen near the mean
      // degree so rounds actually remove vertices
      val edges = (1 to 300).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
        .distinct
      val k = 6
      // reference: 3 peel rounds over an adjacency map
      var sym = edges.flatMap(e => Seq(e, e.swap)).toSet
      for (_ <- 1 to 3) {
        val deg = sym.groupBy(_._1).map { case (v, es) => v -> es.size }
        val keep = deg.filter(_._2 >= k).keySet
        sym = sym.filter(e => keep(e._1) && keep(e._2))
      }
      val expect = sym.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
      // Spark path: same peel over a DataFrame edge relation (the
      // KCorePeel loop body, without the fixture-bound pair join)
      var df = edges.toDF("pa", "pb")
        .select(col("pa").as("v"), col("pb").as("u"))
        .unionAll(edges.toDF("pa", "pb").select(col("pb").as("v"), col("pa").as("u")))
      for (_ <- 1 to 3) {
        val keep = df.groupBy(col("v")).agg(count(lit(1)).as("dg"))
          .where(col("dg") >= k).select(col("v"))
        df = df.join(keep, Seq("v"), "left_semi")
          .join(keep.withColumnRenamed("v", "u"), Seq("u"), "left_semi")
      }
      val got = df.groupBy(col("v")).agg(count(lit(1)).as("deg"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"seed $seed: kcore mismatch got=$got expect=$expect")
    }
  }
}
