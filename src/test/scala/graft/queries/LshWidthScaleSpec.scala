package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Standing vec100k gate for the corpus-linked LSH code width (the
  * round-11 close left this tier as a manual GenScale + LshTierProbe
  * ritual; this spec makes it part of every test run). The 100k tier
  * is derived in-memory exactly as GenScale's `vectors` mode writes it
  * — 50 rotated copies of the sf0.1 embeddings (rotation preserves
  * unit norm and distribution shape, copies decorrelate) — and the
  * gate pins the width rule's three scale claims WITHOUT the verify
  * join (the 30 s+ tail stays in the manual probe; occupancy and
  * within-bucket pair volume are the quantities the rule controls, and
  * they come from one census aggregate over the map-only code build):
  *
  *  1. the rule widens: 8 bits at the oracle tiers, 14 at 100k — so
  *     expected occupancy n/2^bits stays at the ~2³ operating point;
  *  2. no bucket approaches the hot cap at 50× fixture scale (the cap
  *     stays a skew guard, not a recall tax — sf1 close measured max
  *     82 vs 500);
  *  3. within-bucket candidate volume stays linear-in-n: Σ B(B−1)/2
  *     over buckets, the thing that exploded ∝ n²/2^bits at FIXED
  *     width (q115 27 s / q55 13 s at sf1 before the rule landed).
  */
class LshWidthScaleSpec extends AnyFunSuite with SparkTestSession {

  private val N = 100000L

  private def vec100k: DataFrame = {
    val base = graft.Tables(spark, "/root/testdata/sf0.1", "embeddings")
    (0 until 50).map { c =>
      val rotated = if (c == 0) base else base.withColumn("embedding",
        expr(s"concat(slice(embedding, ${c + 1}, ${64 - c}), slice(embedding, 1, $c))"))
      rotated.withColumn("vec_id", col("vec_id") + lit(c * graft.GenScale.KeyShift))
    }.reduce(_ unionByName _)
  }

  test("width rule output at the gate tiers") {
    assert(Vectors.lshBandBits(200) == 8 && Vectors.lshBandBits(2000) == 8,
      "oracle tiers must keep the historical 8 bits (hash stability)")
    assert(Vectors.lshBandBits(20000) == 12, "sf1 tier widens to 12")
    assert(Vectors.lshBandBits(N) == 14, "100k tier widens to 14")
    // the invariant behind the specific values: expected occupancy
    // n / 2^bits stays within [2, 16] around the 2^3 design point
    for (n <- Seq(200L, 2000L, 20000L, N, 1000000L, 100000000L)) {
      val occ = n.toDouble / (1L << Vectors.lshBandBits(n))
      assert(occ <= 16.0, s"expected occupancy $occ at n=$n escapes the design point")
    }
  }

  test("100k-tier bucket census: max under the hot cap, pair volume linear in n") {
    val bits = Vectors.lshBandBits(N)
    val codes = vec100k.select(col("vec_id"), posexplode(
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.LshCodes(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(
            col("embedding")), bits))).as(Seq("band", "code")))
    val census = codes.groupBy(col("band"), col("code"))
      .agg(count(lit(1)).as("bsz"))
      .agg(count(lit(1)).as("buckets"), max(col("bsz")).as("maxb"),
        sum(col("bsz")).as("rows"),
        (sum(col("bsz") * (col("bsz") - 1)) / 2).cast("long").as("pairs"))
      .head()
    val (buckets, maxb, rows, pairs) =
      (census.getLong(0), census.getLong(1), census.getLong(2), census.getLong(3))
    info(s"buckets=$buckets maxb=$maxb rows=$rows pairs=$pairs")
    assert(rows == N * 8, "8 band rows per vector")
    assert(maxb < LlmText.HotBucketCap / 2,
      s"hottest bucket $maxb must stay well under the cap ${LlmText.HotBucketCap} at 50x fixture scale")
    // linear-in-n: within-bucket pairs per vector stays a small
    // constant at the rule's width (≈ 8 bands × occupancy/2 ≈ 25;
    // generous 4x slack for the measured skew). At a FIXED 8 bits the
    // same census yields ~64x this bound — the regression this gate
    // exists to catch.
    assert(pairs < 100L * N,
      s"within-bucket pair volume $pairs exceeds 100/vector - width rule regressed")
  }
}
