package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q70 hot-cell guard (VERDICT r4 item 1): a degenerate corpus that
  * concentrates k-means mass in one cell must not turn the within-cell
  * pair join back into all-pairs on a single shuffle key. Sub-splitting
  * (KMeansLloyd.subSplitCells) bounds every (cell, subcell) bucket near
  * the cap and the pair count at ~cap·n — while fixture-scale cells,
  * all far below the cap, keep subcell ≡ 0 so the registered q70/q73
  * entries hash identically to the uncapped DuckDB oracle. */
class KMeansCellCapSpec extends AnyFunSuite with SparkTestSession {

  test("hot cell sub-splits: bucket sizes and pair count stay bounded") {
    // 1000 identical vectors — the degenerate template-text corpus —
    // plus a few spread ones. All identical vectors land in one cell
    // (ties assign to the lowest cell id), which uncapped would emit
    // 1000·999/2 ≈ 500k pairs from ONE shuffle key.
    import spark.implicits._
    val hot = (0L until 1000L).map(i => (i, Array(1000000L, 1000000L, 0L, 0L)))
    val far = (0 until 8).map(j =>
      (1000L + j, Array(-1000000L + j * 1000L, -1000000L, 500000L * (j % 2), -500000L)))
    val vecs = (hot ++ far).toDF("vec_id", "xi")
    val (assigned, _) = KMeansLloyd.run(vecs, "vec_id", k = 4, iters = 2)

    val cap = 50
    val sub = KMeansLloyd.subSplitCells(assigned, "vec_id", cap)

    // every (cell, subcell) bucket is near the cap (md5 split is
    // uniform, not exact — allow 2x slack), never the whole hot cell
    val sizes = sub.groupBy(col("cell"), col("subcell"))
      .agg(count(lit(1)).as("c")).collect().map(_.getAs[Long]("c"))
    assert(sizes.max <= 2L * cap,
      s"a sub-cell bucket holds ${sizes.max} members (cap $cap)")
    assert(sizes.length >= 1000 / cap,
      s"hot cell split into only ${sizes.length} buckets — parallelism did not scale")

    // pair fan-out through the capped join is linear in n (≤ cap·n),
    // not quadratic: ~25k pairs here vs ~500k uncapped
    val n = 1008L
    val pairs = sub.as("x").join(sub.as("y"),
        col("x.cell") === col("y.cell") && col("x.subcell") === col("y.subcell") &&
          col("x.vec_id") < col("y.vec_id")).count()
    assert(pairs <= cap * n, s"capped pair count $pairs exceeds cap*n = ${cap * n}")
    assert(pairs < 1000L * 999 / 2 / 5, s"pair count $pairs not meaningfully below all-pairs")
  }

  test("cells at or under the cap keep subcell 0 (split is a no-op)") {
    import spark.implicits._
    val vecs = (0L until 120L).map(i =>
      (i, Array(i * 1000L, -i * 500L, 0L, 1000000L))).toDF("vec_id", "xi")
    val (assigned, _) = KMeansLloyd.run(vecs, "vec_id", k = 4, iters = 2)
    val sub = KMeansLloyd.subSplitCells(assigned, "vec_id", cap = 200)
    assert(sub.where(col("subcell") =!= 0L).count() == 0,
      "no cell exceeds the cap, so no row may move off subcell 0")
    assert(sub.count() == 120)
  }

  test("fixture cells are all far below CellCap (q70/q73 hashes can't change)") {
    // guarded at sf0.1 too — the largest tier the builder verifies
    // locally (534 measured there); a fixture regeneration that pushes a
    // cell past the cap would make capped Spark results diverge from the
    // uncapped DuckDB oracle, and this must fail FIRST, with headroom
    for (tier <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val vecs = Tables(spark, tier, "embeddings")
        .select(col("vec_id"), KMeansLloyd.quantize(col("embedding")).as("xi"))
      val (assigned, _) = KMeansLloyd.run(vecs, "vec_id", k = 4, iters = 2)
      val maxCell = assigned.groupBy(col("cell")).agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).head().getLong(0)
      assert(maxCell <= KMeansLloyd.CellCap * 6 / 10,
        s"$tier max cell $maxCell approaching CellCap ${KMeansLloyd.CellCap} — " +
          "raise the cap (and re-measure) before fixtures regenerate further")
    }
  }
}
