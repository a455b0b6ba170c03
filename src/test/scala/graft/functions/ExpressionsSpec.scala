package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the native expressions (interpreted + codegen paths
  * and SQL registration via GraftExtensions) and the enum check. */
class ExpressionsSpec extends AnyFunSuite with SparkTestSession {

  test("ArrayDot computes dot products, handles mismatch and nulls") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)), // 32
      (Seq(1.0, 2.0), Seq(3.0, 4.0, 99.0)), // shorter wins: 11
      (Seq.empty[Double], Seq(1.0)) // 0
    ).toDF("a", "b")
    val got = df.select(VectorFunctions.dot(col("a"), col("b"))).as[Double].collect().toSeq
    assert(got == Seq(32.0, 11.0, 0.0))
    val withNull = Seq((Option.empty[Seq[Double]], Option(Seq(1.0)))).toDF("a", "b")
    assert(withNull.select(VectorFunctions.dot(col("a"), col("b")))
      .collect().head.isNullAt(0))
  }

  test("ArrayDot rejects non-double arrays at analysis") {
    import spark.implicits._
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val e = intercept[Exception](df.select(VectorFunctions.dot(col("a"), col("b"))).collect())
    assert(e.getMessage.toLowerCase.contains("array<double>"))
  }

  test("SortedArrayIntersectCount merges sorted sets") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val df = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L)), // {3,5} = 2
      (Seq(1L, 2L), Seq(3L, 4L)), // 0
      (Seq.empty[Long], Seq(1L)) // 0
    ).toDF("a", "b")
    val got = df.select(ColumnBridge.column(SortedArrayIntersectCount(
      ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b")))))
      .as[Int].collect().toSeq
    assert(got == Seq(2, 0, 0))
  }

  test("GraftExtensions registers vec_dot for SQL") {
    // extensions apply only when a NEW SparkSession is instantiated:
    // clear the shared one so getOrCreate builds a fresh session (over
    // the same SparkContext), then restore
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // (spark.sql.extensions is a static conf — on a shared context use
      // the builder's withExtensions hook, same code path)
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s2.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect().head.getDouble(0)
      assert(r == 11.0)
      val ic = s2.sql(
        "SELECT sorted_intersect_count(array(1L, 3L, 7L), array(3L, 5L, 7L, 9L)) AS c")
        .collect().head.getInt(0)
      assert(ic == 2)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("EnumCheck validates symbol membership") {
    import spark.implicits._
    val df = Seq("active", "disabled").toDF("v")
    val ok = df.select(EnumCheck.assertEnum(col("v"), Seq("active", "disabled")))
      .collect().map(_.getString(0)).toSeq
    assert(ok == Seq("active", "disabled"))
    assert(df.select(EnumCheck.isValidEnum(col("v"), Seq("active")).as("ok"))
      .collect().map(_.getBoolean(0)).toSeq == Seq(true, false))
    val bad = Seq("unknown").toDF("v")
    intercept[Exception](
      bad.select(EnumCheck.assertEnum(col("v"), Seq("active"))).collect())
  }
}
