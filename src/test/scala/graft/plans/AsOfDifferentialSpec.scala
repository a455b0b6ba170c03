package graft.plans

import graft.SparkTestSession
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential test across the THREE as-of implementations —
  * window rewrite, native merge exec (codegen), broadcast exec — on
  * adversarial inputs: duplicate timestamps, ties, null timestamps on
  * both sides, keys present on only one side. Any divergence between
  * independent implementations of the same semantics is a bug in at
  * least one of them. */
class AsOfDifferentialSpec extends AnyFunSuite with SparkTestSession {

  test("window, merge, and broadcast forms agree on randomized adversarial inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 4) {
      def someTs(): Option[Long] =
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(40).toLong)
      val nL = 30 + rnd.nextInt(30)
      val nR = 20 + rnd.nextInt(30)
      // small key space forces collisions; disjoint tails force misses
      val lRows = (0 until nL).map(i =>
        (rnd.nextInt(6).toLong, someTs(), 1000L + i))
      val rRows = (0 until nR).map(i =>
        ((rnd.nextInt(6) + (if (rnd.nextInt(8) == 0) 100 else 0)).toLong,
          someTs(), 2000L + i))
      val l = lRows.toDF("k", "t", "lid")
      val r = rRows.toDF("k", "t", "rid")

      // window form shares the ts/tie column names across sides
      val lW = l.select(col("k"), col("t"), col("lid").as("id"))
      val rW = r.select(col("k"), col("t"), col("rid").as("id"))
      val viaWindow = AsOfJoin.backward(lW, rW, Seq("k"), "t", "id", Seq("id"))
        .select(col("id").as("lid"), col("_asof.id").as("rid"))
        .collect().map(row => row.getLong(0) -> Option(row.get(1))).toMap
      val rNative = r.select(col("k"), col("t").as("rt"), col("rid"))
      def native(bcast: Boolean) =
        AsOfJoinNative.backward(l, rNative, Seq("k"), "t", "rt", "rid",
            broadcastRight = bcast)
          .select(col("lid"), col("rid"))
          .collect().map(row => row.getLong(0) -> Option(row.get(1))).toMap
      val viaMerge = native(false)
      val viaBcast = native(true)

      // reference model computed in plain Scala
      val byKey = rRows.filter(_._2.isDefined).groupBy(_._1)
      val model = lRows.map { case (k, t, lid) =>
        lid -> t.flatMap { lts =>
          byKey.getOrElse(k, Nil)
            .filter(_._2.get <= lts)
            .sortBy(x => (x._2.get, x._3))
            .lastOption.map(_._3)
        }
      }.toMap

      assert(viaMerge == model, s"trial $trial: merge != model")
      assert(viaBcast == model, s"trial $trial: broadcast != model")
      assert(viaWindow == model.map { case (k, v) => k -> v.map(_.asInstanceOf[Any]) },
        s"trial $trial: window != model")
    }
  }
}
