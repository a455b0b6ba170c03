package graft.streaming

import graft.SparkTestSession
import graft.operators.DedupGroups
import graft.queries.LlmText
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Online re-band migration (q66h): re-banding the committed near-dup
  * state from the (8, 2) design to (4, 4) must be byte-identical to
  * having indexed at (4, 4) from the start — bands/ rebuilt from the
  * signatures sets/ retains, pairs/ restricted to what the target
  * design co-buckets, and a consumer constructed at (4, 4) continuing
  * on the migrated state. The corpus is synthetic with MID-JACCARD
  * pairs (~0.47 — above the 0.35 verify threshold, below the (4, 4)
  * design threshold ≈ 0.71) precisely so the two designs disagree:
  * such a pair usually collides on some (8, 2) band (per-band p ≈ j²)
  * but not on any (4, 4) band (p ≈ j⁴), making the pairs/ restriction
  * observably load-bearing rather than a no-op. */
class RebandMigrationSpec extends AnyFunSuite with SparkTestSession {

  /** 8 mid-jaccard pairs (26-token shared prefix, 14-token distinct
    * tails → bigram jaccard ≈ 25/53 ≈ 0.47), 2 exact-dup pairs, and
    * singleton filler. All pair partners share wave 1 (ids < 100) so
    * their pairs are discovered BEFORE the migration. */
  private def corpus: DataFrame = {
    import spark.implicits._
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    for (p <- 0 until 8) {
      val shared = (0 until 26).map(k => s"s${p}w$k").mkString(" ")
      val tailA = (0 until 14).map(k => s"a${p}t$k").mkString(" ")
      val tailB = (0 until 14).map(k => s"b${p}t$k").mkString(" ")
      rows += ((2L * p, s"$shared $tailA"))
      rows += ((2L * p + 1, s"$shared $tailB"))
    }
    for (p <- 0 until 2) {
      val text = (0 until 30).map(k => s"x${p}d$k").mkString(" ")
      rows += ((20L + 2 * p, text))
      rows += ((21L + 2 * p, text))
    }
    for (i <- 0 until 20)
      rows += ((100L + i, (0 until 25).map(k => s"f${i}u$k").mkString(" ")))
    rows.toSeq.toDF("doc_id", "text")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def batchPairs(docs: DataFrame, b: Int, r: Int): DataFrame = {
    val st = LlmText.nearDupState(docs).localCheckpoint(true)
    LlmText.verifyPairs(LlmText.bandedCandidates(st, b, r), st)
  }

  test("migrate-then-continue equals a fresh (4,4) run; the pair filter is load-bearing") {
    val docs = corpus.localCheckpoint(true)
    val st = LlmText.nearDupState(docs).localCheckpoint(true)
    val statePath = java.nio.file.Files
      .createTempDirectory("reband").toString

    val inc82 = new IncrementalNearDup(statePath)
    inc82.processState(st.where(col("doc_id") < 100), 0L)
    val before = pairSet(inc82.pairs(spark))

    // the corpus is built so the designs disagree: at least one
    // mid-jaccard pair is (8,2)-discovered but not (4,4)-co-bucketed
    val b44 = pairSet(batchPairs(docs, 4, 4))
    val b82 = pairSet(batchPairs(docs, 8, 2))
    assert((b82 -- b44).nonEmpty,
      "fixture must contain a pair the designs disagree on")
    assert(b44.subsetOf(b82),
      "a (4,4) band match is two aligned (8,2) matches - subset must hold")

    IncrementalNearDup.rebandMigrate(spark, statePath, 4, 4)
    val migrated = pairSet(new IncrementalNearDup(statePath,
      nBands = 4, bandR = 4).pairs(spark))
    assert((before -- migrated).nonEmpty,
      "migration must drop the (8,2)-only pairs - otherwise it is a no-op here")

    val inc44 = new IncrementalNearDup(statePath, nBands = 4, bandR = 4)
    inc44.processState(st.where(col("doc_id") >= 100), 1L)

    assert(pairSet(inc44.pairs(spark)) == b44,
      "migrated stream must equal the fresh (4,4) batch run")
    val streamGroups = inc44.groups(spark).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchGroups = DedupGroups.components(batchPairs(docs, 4, 4))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamGroups == batchGroups)
  }

  test("migrated band index is byte-identical to bandKeys at the target design") {
    val docs = corpus.where(col("doc_id") < 100).localCheckpoint(true)
    val st = LlmText.nearDupState(docs).localCheckpoint(true)
    val statePath = java.nio.file.Files
      .createTempDirectory("reband-keys").toString
    new IncrementalNearDup(statePath).processState(st, 0L)
    IncrementalNearDup.rebandMigrate(spark, statePath, 4, 4)

    def keyRows(df: DataFrame): Set[String] =
      df.select(concat_ws("|", col("doc_id"), col("band"),
        col("key.k0"), col("key.k1"), col("key.k2"), col("key.k3")))
        .collect().map(_.getString(0)).toSet

    val fromState = keyRows(
      spark.read.parquet(s"$statePath/bands").drop(StateLayout.BucketCol))
    val fromText = keyRows(LlmText.bandKeys(st, 4, 4))
    assert(fromState == fromText && fromState.nonEmpty)
  }

  test("empty sets/ state fails with a message, not an opaque head() error") {
    // ADVICE r11: the stored-width probe must not surface an
    // existing-but-empty sets/ dir as a bare NoSuchElementException
    val statePath = java.nio.file.Files
      .createTempDirectory("reband-empty").toString
    val empty = LlmText.nearDupState(corpus.where(lit(false)))
      .select(col("doc_id"), col("hs"), col("nbg"),
        array((0 until 16).map(i => col(s"h$i")): _*).as("sig"))
    // a compaction that swept every row leaves schema-bearing empty
    // part files — repartition(1) forces one such file out
    empty.repartition(1).write.parquet(s"$statePath/sets")
    val e = intercept[IllegalStateException] {
      IncrementalNearDup.rebandMigrate(spark, statePath, 4, 4)
    }
    assert(e.getMessage.contains("empty"))
  }

  test("migration is idempotent") {
    val docs = corpus.localCheckpoint(true)
    val st = LlmText.nearDupState(docs).localCheckpoint(true)
    val statePath = java.nio.file.Files
      .createTempDirectory("reband-idem").toString
    new IncrementalNearDup(statePath).processState(st, 0L)

    def snapshot(): (Set[String], Set[(Long, Long)]) = {
      val bands = spark.read.parquet(s"$statePath/bands")
        .drop(StateLayout.BucketCol)
        .select(concat_ws("|", col("doc_id"), col("band"),
          col("key.k0"), col("key.k1"), col("key.k2"), col("key.k3")))
        .collect().map(_.getString(0)).toSet
      val pairs = pairSet(spark.read.parquet(s"$statePath/pairs")
        .drop(StateLayout.BucketCol))
      (bands, pairs)
    }

    IncrementalNearDup.rebandMigrate(spark, statePath, 4, 4)
    val once = snapshot()
    IncrementalNearDup.rebandMigrate(spark, statePath, 4, 4)
    assert(snapshot() == once)
  }
}
