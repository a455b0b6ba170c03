package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 (q67) invariants beyond the oracle hash: the one transcendental
  * in the chain (the idf's `ln`) is quantized with a safe margin on the
  * actual fixture inputs, scoring is partitioning-independent, and the
  * top-k is well-formed. */
class Bm25Spec extends AnyFunSuite with SparkTestSession {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("fixture idf inputs land far from the 1e-6 quantization boundary") {
    // Engine libms may differ in the last ulp of ln (measured 1/249
    // probe inputs vs DuckDB). A flip of floor(idf·1e6 + 0.5) needs the
    // argument within ~1 ulp of an integer; assert every ACTUAL fixture
    // (N, df) input keeps a margin of 1e-3 — 10^12 ulps of headroom.
    for (dir <- dirs) {
      val docsDf = Tables(spark, dir, "documents")
      val n = docsDf.count()
      val dfs = docsDf
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .where(col("tok").isin(Pipeline.Bm25Terms: _*))
        .select(col("doc_id"), col("tok")).distinct()
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      assert(dfs.length == Pipeline.Bm25Terms.length,
        s"$dir: every query term should appear in the corpus")
      for ((term, df) <- dfs) {
        val x = math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6 + 0.5
        val margin = math.abs(x - math.rint(x))
        assert(margin > 1e-3, s"$dir term '$term' idf boundary margin $margin too small")
      }
    }
  }

  test("scores are independent of input partitioning") {
    val docsDf = Tables(spark, dirs.head, "documents")
    def scores(parts: Int): Map[Long, Long] =
      Pipeline.bm25Scores(docsDf.repartition(parts)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baseline = scores(1)
    assert(baseline.nonEmpty)
    for (parts <- Seq(5, 8)) assert(scores(parts) == baseline,
      s"bm25 scores changed under repartition($parts)")
  }

  test("matches an independent driver-side BM25 on the fixture (differential)") {
    // reference implementation over plain collections with the same
    // quantization rules — pins the distributed agg/join chain to the
    // scoring formula itself
    val docsRows = Tables(spark, dirs.head, "documents")
      .select(col("doc_id"), col("text")).collect()
    val toks = docsRows.map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val dl = toks.map { case (id, t) => id -> t.length }.toMap
    val n = toks.length
    val avgdl = dl.values.sum.toDouble / n
    val dfm = Pipeline.Bm25Terms.map(t => t -> toks.count(_._2.contains(t))).toMap
    val idfMu = Pipeline.Bm25Terms.filter(dfm(_) > 0).map(t => t ->
      math.floor(math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0) * 1000000 + 0.5).toLong).toMap
    val ref = toks.flatMap { case (id, t) =>
      val contribs = Pipeline.Bm25Terms.flatMap { term =>
        val tf = t.count(_ == term)
        if (tf == 0) None
        else Some(math.floor(idfMu(term) *
          (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))) + 0.5).toLong)
      }
      if (contribs.isEmpty) None else Some(id -> contribs.sum)
    }.toMap
    val got = Pipeline.bm25Scores(Tables(spark, dirs.head, "documents")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }

  test("q67 top-20 is well-formed: term-bearing docs, positive integer scores, ranked") {
    val dir = dirs.head
    val rows = SparkEntry.queries("q67_bm25_retrieval")(spark, dir).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getAs[Long]("score_micro"))
    assert(scores.forall(_ > 0L))
    assert(scores.sameElements(scores.sorted.reverse), "must be ranked by score desc")
    val returned = rows.map(_.getAs[Long]("doc_id")).toSet
    val bearing = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .where(col("tok").isin(Pipeline.Bm25Terms: _*))
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(returned.subsetOf(bearing), "every returned doc must contain a query term")
  }
}
