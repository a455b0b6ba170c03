package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Random-hyperplane LSH for cosine similarity — the scale path for
  * near-duplicate detection and ANN over embeddings (brute-force
  * variants: Q42/Q47/Q48 in [[graft.queries.Vectors]]).
  *
  * `nBits` sign-of-projection bits form a signature; signatures are cut
  * into `bands`, and only pairs agreeing on at least one band become
  * candidates — an equi-join on (band, value) buckets instead of the n²
  * pair space. Candidates are re-ranked with exact cosine. Recall is
  * tuned by bands × bits (more bands → more candidates → higher
  * recall); verified empirically in AnnLshSpec rather than oracle-hashed
  * (bucketing is approximate by design).
  *
  * Hyperplanes are seeded-deterministic and broadcast as literals, so
  * the signature computation is a pure map-side projection — at 100 TB
  * the only shuffle is the bucket join on candidate keys.
  */
object AnnLsh {

  /** Deterministic hyperplanes: `nBits` × `dim` gaussians. */
  def planes(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Adds a `sig` long column: bit j = sign(v · plane_j). */
  def withSignature(df: DataFrame, vecCol: String, dim: Int, nBits: Int,
      seed: Long = 42L): DataFrame = {
    require(nBits <= 62, "signature must fit a long")
    val ps = planes(dim, nBits, seed)
    val sig = (0 until nBits).map { j =>
      when(dot(vecDouble(col(vecCol)), typedlit(ps(j).toSeq)) > 0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("sig", sig)
  }

  /** Candidate pairs (idA < idB) sharing at least one of `bands` bands. */
  def candidatePairs(sigs: DataFrame, idCol: String, nBits: Int, bands: Int): DataFrame = {
    val bandBits = nBits / bands
    val mask = (1L << bandBits) - 1
    val banded = sigs.select(col(idCol), posexplode(array((0 until bands).map(b =>
      expr(s"(sig div shiftleft(1L, ${b * bandBits})) % ${mask + 1}")): _*)).as(Seq("band", "bv")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
  }

  /** Approximate top-k neighbors per vector: LSH candidates → exact
    * cosine re-rank → k best. */
  def approxTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, nBits: Int = 16, bands: Int = 4, seed: Long = 42L): DataFrame = {
    val sigs = withSignature(df, vecCol, dim, nBits, seed)
      .select(col(idCol), vecDouble(col(vecCol)).as("_v"), col("sig"))
    val cand = candidatePairs(sigs, idCol, nBits, bands)
    // score both directions so every id gets its neighbor list
    val directed = cand.unionByName(
      cand.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val scored = directed
      .join(sigs.select(col(idCol).as("id_a"), col("_v").as("va")), "id_a")
      .join(sigs.select(col(idCol).as("id_b"), col("_v").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("sim"))
    val w = Window.partitionBy(col("id_a")).orderBy(col("sim").desc, col("id_b"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("id_a").as(idCol), col("rnk"), col("id_b").as("neighbor_id"), col("sim"))
  }
}
