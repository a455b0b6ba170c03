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

  /** Per-cell member cap for pair-generating consumers (q70 semantic
    * dedup). A within-cell self-join on a cell of B members emits
    * B(B−1)/2 pairs from ONE shuffle key — a degenerate corpus (one
    * dominant topic, template text embedded identically) concentrates
    * mass in a few cells and turns "cluster-bucketed" back into
    * all-pairs locally, with a parallelism ceiling of k active keys on
    * top. Cells above the cap are deterministically SUB-SPLIT (not
    * dropped — dedup matters MOST inside hot cells) via
    * [[subSplitCells]]. The primary k-choice rule is SemDeDup's
    * k ≈ n / targetCellSize (targetCellSize ≈ CellCap/2), which keeps
    * expected cells under the cap; the sub-split is the skew guard for
    * cells the k-choice can't control. Fixture cells stay well under
    * the cap (max 534 at sf0.1, 143 at sf0.01 — measured, guarded by
    * KMeansCellCapSpec), so capped results hash identically to the
    * uncapped oracle. */
  val CellCap = 1000

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
    val (assigned, _, cents) = runTracked(vecs, idCol, k, iters)
    (assigned, cents)
  }

  /** [[run]] plus the centroids the FINAL assignment was scored against
    * (the ones a multi-probe consumer must rank cells by — ranking by
    * the post-update centroids would disagree with the assignment's own
    * argmin and could rank a row's assigned cell below an unprobed one). */
  def runTracked(vecs: DataFrame, idCol: String, k: Int,
      iters: Int): (DataFrame, Seq[Centroid], Seq[Centroid]) = {
    val seeds = vecs.orderBy(col(idCol)).limit(k).collect()
      .zipWithIndex.map { case (r, i) => Centroid(i, r.getAs[Seq[Long]]("xi").toArray) }
    var cents: Seq[Centroid] = seeds.toSeq
    var assignCents: Seq[Centroid] = cents
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assignCents = cents
      assigned = assign(vecs, cents)
      cents = update(assigned)
    }
    (assigned, assignCents, cents)
  }

  /** Top-`nProbe` nearest cells per input row by exact integer distance
    * to `cents` — the multi-probe expansion of an IVF query side. Adds
    * `cell`, one output row per (row, probed cell); ties rank by lower
    * cell id (array_sort on (dist, cell) structs — the same total order
    * as [[assign]]'s array_min, so probe rank 1 IS the assigned cell).
    * Map-only like assign: centroids ride as plan literals. */
  def probeCells(vecs: DataFrame, cents: Seq[Centroid], nProbe: Int): DataFrame = {
    val scored = array(cents.map(c =>
      struct(distTo(c).as("dist"), lit(c.cell).as("cell"))): _*)
    vecs.withColumn("cell",
        explode(slice(array_sort(scored), 1, nProbe).getField("cell")))
  }

  /** Deterministic hot-cell sub-split (the [[CellCap]] guard): cells
    * with more than `cap` members are split into ceil(size/cap)
    * md5-bucketed sub-cells, so a pair-generating consumer joins on
    * (cell, subcell) and each shuffle key holds ≤ ~cap members — pair
    * fan-out per key drops from B²/2 to ~cap·B/2 (linear in B) and
    * parallelism scales with the number of sub-cells instead of
    * ceiling at k. The split is a pure per-row function of the id
    * (salted md5 — the q58 doctrine), so membership is reproducible on
    * any partitioning. Cost: one k-row size agg broadcast back onto the
    * members — no extra shuffle of the data. Cells at or under the cap
    * get subcell 0 unconditionally, so at fixture scale (every cell
    * ≤ cap) results are bit-identical to the unsplit form. Recall
    * caveat mirrors the cell boundary itself: pairs straddling a
    * sub-cell boundary inside a hot cell are not compared. */
  def subSplitCells(assigned: DataFrame, idCol: String, cap: Int): DataFrame = {
    val sizes = assigned.groupBy(col("cell")).agg(count(lit(1)).as("csz"))
    assigned.join(broadcast(sizes), Seq("cell"))
      .withColumn("nsub", ceil(col("csz").cast("double") / cap).cast("long"))
      .withColumn("subcell",
        when(col("nsub") > 1L,
          conv(substring(md5(concat(lit("subcell:"), col(idCol).cast("string"))), 1, 8), 16, 10)
            .cast("long") % col("nsub"))
          .otherwise(0L))
      .drop("csz", "nsub")
  }
}
