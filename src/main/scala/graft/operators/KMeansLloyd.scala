package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable Lloyd's k-means over embedding columns
  * — the centroid trainer behind an IVF ANN index ([[AnnIvf]] uses
  * MLlib's KMeans, whose k-means|| init and float accumulation are
  * engine-specific), and the topic-bucketing step of a corpus curation
  * run (cluster-then-rebalance).
  *
  * Everything is computed in quantized integer space so the result is a
  * pure function of the data — independent of partitioning, task order,
  * or engine:
  *
  *   - components are quantized once: `xi = floor(x·1e6 + 0.5)` as LONG
  *     (the q55 doctrine — exact on any engine);
  *   - distances are exact integer `Σ (xi − ci)²` (|xi| ≤ ~1e6, 64 dims
  *     → ≪ 2^63, no overflow);
  *   - assignment ties break on the lower cell id;
  *   - updated centroids are re-quantized per dimension:
  *     `ci = floor(Σxi / n + 0.5)` — the one double op, a correctly-
  *     rounded division of exact integers, bit-identical everywhere;
  *   - seeds are the `k` lowest-id vectors (data-deterministic, no RNG);
  *   - empty cells are dropped (both engines derive cells only from the
  *     surviving assignment).
  *
  * Scale shape (the reason to run Lloyd's THIS way at 100 TB): the
  * assignment pass is map-only — centroids are folded into the plan as
  * literal arrays (k·dim ≤ a few thousand constants), so scoring never
  * joins or shuffles; the update pass is one `groupBy(cell, d)` hash
  * aggregation into k·dim groups with map-side partials; and the only
  * driver traffic is the k·dim centroid table per iteration (bounded,
  * like [[AnnIvf]]'s centroid collect). Total cost = `iters` linear
  * scans + `iters` tiny shuffles.
  */
object KMeansLloyd {

  /** (cell id, quantized centroid components). */
  final case class Centroid(cell: Int, ci: Array[Long])

  /** Quantize an `array<numeric>` embedding column to micro-unit longs. */
  def quantize(embedding: Column): Column =
    transform(embedding, x => floor(x.cast("double") * 1000000 + lit(0.5)).cast("long"))

  /** Exact integer squared L2 distance from `xi` to a literal centroid. */
  private def distTo(c: Centroid): Column = {
    val lits = array(c.ci.map(lit(_)): _*)
    aggregate(
      zip_with(col("xi"), lits, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
  }

  /** One assignment pass: adds `cell` = argmin over `cents` of the exact
    * integer distance, ties to the lower cell id. Map-only — the
    * centroids ride along as literals, no join. */
  def assign(vecs: DataFrame, cents: Seq[Centroid]): DataFrame = {
    val scored = array(cents.map(c =>
      struct(distTo(c).as("dist"), lit(c.cell).as("cell"))): _*)
    vecs.withColumn("cell", array_min(scored).getField("cell"))
  }

  /** One centroid update: per-(cell, dim) mean, re-quantized. Returns
    * only non-empty cells, ordered by cell id. */
  def update(assigned: DataFrame): Seq[Centroid] = {
    val rows = assigned
      .select(col("cell"), posexplode(col("xi")).as(Seq("d", "x")))
      .groupBy(col("cell"), col("d"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .collect() // k·dim rows — bounded, like AnnIvf's centroid collect
    rows.groupBy(_.getAs[Int]("cell")).toSeq.sortBy(_._1).map { case (cell, rs) =>
      val ci = rs.sortBy(_.getAs[Int]("d")).map { r =>
        math.floor(r.getAs[Long]("sx").toDouble / r.getAs[Long]("n") + 0.5).toLong
      }.toArray
      Centroid(cell, ci)
    }
  }

  /** `iters` rounds of assign→update from lowest-id seeds. Input must
    * have (`idCol`, `xi: array<bigint>`). Returns the final assignment
    * (with `cell`) and the final centroids. */
  def run(vecs: DataFrame, idCol: String, k: Int, iters: Int): (DataFrame, Seq[Centroid]) = {
    val seeds = vecs.orderBy(col(idCol)).limit(k).collect()
      .zipWithIndex.map { case (r, i) => Centroid(i, r.getAs[Seq[Long]]("xi").toArray) }
    var cents: Seq[Centroid] = seeds.toSeq
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assigned = assign(vecs, cents)
      cents = update(assigned)
    }
    (assigned, cents)
  }
}
