package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q69 invariants beyond the oracle hash: the quantized surprisal table
  * keeps a safe margin from its 1e-4 rounding boundaries on the actual
  * fixture vocabulary, and the per-source output conserves the corpus. */
class LmSurprisalSpec extends AnyFunSuite with SparkTestSession {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("fixture vocabulary surprisals land far from the 1e-4 quantization boundary") {
    // same doctrine as Bm25Spec: libm ln may differ by an ulp between
    // engines; a floor flip needs the argument within ~1 ulp of an
    // integer, so a 1e-6 margin on floor(ln(T/f)·1e4 + 0.5) leaves ≫ 4
    // orders of magnitude headroom for every actual vocabulary entry
    for (dir <- dirs) {
      val freqs = Tables(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("f"))
        .collect().map(_.getLong(1))
      val t = freqs.sum.toDouble
      for (f <- freqs.distinct) {
        val x = math.log(t / f) * 10000 + 0.5
        val margin = math.abs(x - math.rint(x))
        assert(margin > 1e-6, s"$dir freq=$f surprisal boundary margin $margin too small")
      }
    }
  }

  test("q69 conserves the corpus and orders by source") {
    val dir = dirs.head
    val perSource = Tables(spark, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("q69_lm_surprisal")(spark, dir).collect()
    assert(rows.map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap == perSource)
    assert(rows.forall(r => r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_docs")))
    assert(rows.forall(_.getAs[Long]("avg_surprisal_e4") > 0L))
    val srcs = rows.map(_.getString(0))
    assert(srcs.sameElements(srcs.sorted))
  }

  test("surprisal scoring is independent of input partitioning") {
    // the quantized-integer design makes the whole chain a pure function
    // of the data: identical per-source rows regardless of task layout
    val docsDf = Tables(spark, dirs.head, "documents")
    def rows(parts: Int): Seq[Seq[Any]] =
      Pipeline.lmSurprisal(docsDf.repartition(parts)).collect().toSeq.map(_.toSeq)
    val baseline = rows(1)
    assert(baseline.nonEmpty)
    for (parts <- Seq(5, 8)) assert(rows(parts) == baseline,
      s"surprisal output changed under repartition($parts)")
  }
}
