package graft.functions

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity pin for the native LSH code build (functions/LshCodes): the
  * retired DataFrame chain — explode components → broadcast-join the
  * ±1 md5-parity plane relation → groupBy(vec_id, p) signed sums →
  * groupBy(vec_id, band) bit packing — is replayed here VERBATIM and
  * must produce the identical (vec_id, band, code) set at the fixture
  * width AND at a wider corpus-linked width (the 100k-tier operating
  * point), so the map-only expression can never drift from the
  * semantics the DuckDB oracle CTEs mirror. */
class LshCodesSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  /** The pre-native chain, kept bit-for-bit (including the double
    * quantization path through vecDouble's element cast). */
  private def chainCodes(bandBits: Int): DataFrame = {
    import spark.implicits._
    val nPlanes = 8 * bandBits
    val planeRows = for { p <- 0 until nPlanes; dim <- 0 until 64 } yield {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$p:$dim".getBytes("UTF-8"))
      val firstHexNibble = (digest(0) >> 4) & 0xf
      (p, dim, if (firstHexNibble % 2 == 1) 1L else -1L)
    }
    val planes = planeRows.toDF("p", "d", "w")
    val comps = Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        posexplode(transform(col("embedding"), _.cast("double"))).as(Seq("d", "x")))
      .select(col("vec_id"), col("d"),
        expr("CAST(floor(x * 1000000 + 0.5) AS BIGINT)").as("xi"))
    comps.join(broadcast(planes), Seq("d"))
      .groupBy(col("vec_id"), col("p")).agg(sum(col("w") * col("xi")).as("sgn"))
      .groupBy(col("vec_id"), expr(s"p div $bandBits").as("band"))
      .agg(sum(when(col("sgn") >= 0, expr(s"shiftleft(1L, p % $bandBits)"))
        .otherwise(0L)).as("code"))
      // `p div bits` is LongType, posexplode's pos is Int — a
      // representational difference only; normalize for the compare
      .select(col("vec_id"), col("band").cast("int").as("band"), col("code"))
  }

  private def nativeCodes(bandBits: Int): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), posexplode(
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          LshCodes(org.apache.spark.sql.graftbridge.ColumnBridge.expression(
            col("embedding")), bandBits))).as(Seq("band", "code")))

  private def asSet(df: DataFrame): Set[(Long, Int, Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("native codes equal the declarative chain at the fixture width (8 bits)") {
    val native = asSet(nativeCodes(8))
    assert(native == asSet(chainCodes(8)))
    assert(native.nonEmpty)
    // every vector carries exactly 8 bands
    assert(native.size == native.map(_._1).size * 8)
  }

  test("native codes equal the declarative chain at a widened width (12 bits)") {
    assert(asSet(nativeCodes(12)) == asSet(chainCodes(12)))
  }

  test("codes depend on the width (the widening step is real)") {
    assert(asSet(nativeCodes(8)).map(t => (t._1, t._2, t._3)) !=
      asSet(nativeCodes(12)).map(t => (t._1, t._2, t._3)))
  }
}
