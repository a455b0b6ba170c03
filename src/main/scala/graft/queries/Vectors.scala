package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity operators (SURVEY.md §2C Q42 + ANN/near-dup from
  * the LLM-pipeline mandate).
  *
  * Vectors are L2-normalized once per row before any pairing, so a pair
  * costs one dot product instead of dot + two norms — at n² pair counts
  * that's the dominant constant. Q42/Q48 broadcast the (tiny) query-
  * vector side so the big-table scan is a single map-side pass — the
  * shape that holds at 100 TB (probe side streams, no shuffle).
  * Brute-force scoring is the correctness baseline; the LSH-bucketed
  * scale path lives in [[graft.operators.AnnLsh]] and is recall-tested
  * in ScalaTest rather than oracle-hashed (bucketing is approximate by
  * design).
  */
object Vectors {

  /** Embeddings as unit vectors (`u`), elements cast to DOUBLE first
    * (float32 leakage breaks oracle parity, SURVEY.md §7.3). */
  private def embUnit(s: SparkSession, d: String): DataFrame = {
    val v = vecDouble(col("embedding"))
    Tables(s, d, "embeddings")
      .select(col("vec_id"), v.as("v"), l2Norm(v).as("n"))
      .select(col("vec_id"), transform(col("v"), x => x / col("n")).as("u"))
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q42_cosine_topk",
      (s, d) => {
        val e = embUnit(s, d)
        val q = broadcast(e.where(col("vec_id") === 0).select(col("u").as("qu")))
        e.where(col("vec_id") =!= 0).crossJoin(q)
          .select(col("vec_id"), round(dot(col("u"), col("qu")), 4).as("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(5)
      },
      Some("WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0), " +
        "z AS (SELECT e.vec_id, UNNEST(CAST(e.embedding AS DOUBLE[])) AS a, UNNEST(q.qe) AS b " +
        "FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0), " +
        "s AS (SELECT vec_id, SUM(a*b) AS dot, SQRT(SUM(a*a)) AS na, SQRT(SUM(b*b)) AS nb " +
        "FROM z GROUP BY vec_id) " +
        "SELECT vec_id, ROUND(dot/(na*nb), 4) AS sim FROM s ORDER BY sim DESC, vec_id LIMIT 5")),

    QueryDef("q47_cosine_neardup",
      // Exact all-pairs near-dup at oracle scale; the banded-LSH variant
      // (AnnLsh) replaces the O(n²) pair space at cluster scale.
      (s, d) => {
        val e = embUnit(s, d)
        // single-file parquet reads as one partition: spread the probe
        // side or the n² dot loop runs in a single task
        val spread = e.repartition(s.sparkContext.defaultParallelism)
        broadcast(e.as("a")).join(spread.as("b"), col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
            round(dot(col("a.u"), col("b.u")), 4).as("sim"))
          .where(col("sim") >= 0.4)
          .orderBy(col("vec_a"), col("vec_b"))
      },
      Some("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) " +
        "SELECT vec_a, vec_b, sim FROM (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, " +
        "ROUND(list_cosine_similarity(a.v, b.v), 4) AS sim FROM e a JOIN e b ON a.vec_id < b.vec_id) " +
        "WHERE sim >= 0.4 ORDER BY vec_a, vec_b")),

    QueryDef("q48_ann_topk",
      (s, d) => {
        val e = embUnit(s, d).repartition(s.sparkContext.defaultParallelism)
        val q = broadcast(e.where(col("vec_id").between(1, 5))
          .select(col("vec_id").as("query_id"), col("u").as("qu")))
        val scored = e.join(q, col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            round(dot(col("u"), col("qu")), 4).as("sim"))
        val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
        scored.withColumn("rnk", row_number().over(w))
          .where(col("rnk") <= 3)
          .select(col("query_id"), col("rnk"), col("vec_id").as("neighbor_id"), col("sim"))
          .orderBy(col("query_id"), col("rnk"))
      },
      Some("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id BETWEEN 1 AND 5), " +
        "c AS (SELECT q.query_id, e.vec_id, ROUND(list_cosine_similarity(e.v, q.qv), 4) AS sim " +
        "FROM e JOIN q ON e.vec_id <> q.query_id), " +
        "r AS (SELECT query_id, vec_id, sim, ROW_NUMBER() OVER (PARTITION BY query_id " +
        "ORDER BY sim DESC, vec_id) AS rnk FROM c) " +
        "SELECT query_id, rnk, vec_id AS neighbor_id, sim FROM r WHERE rnk <= 3 " +
        "ORDER BY query_id, rnk")))
}
