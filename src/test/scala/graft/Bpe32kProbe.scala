package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The 32k-vocabulary BPE training run (VERDICT r13 item 5) at the
  * derived sf1 tier — the production-vocabulary bar the wide trainer
  * (q142's oracle-certified loop) was built for.
  *
  * Verification shape: a 110+-round DuckDB training replay is the
  * ORACLE's cost, not the engine's — measured 70 s for 10 rounds over
  * the sf0.1 vocab (the q138 oracle), so a 32k-merge chain would run
  * ~15 min at sf0.1 and hours at sf1, which rules out a registered
  * per-tier oracle entry. The strongest independent check that remains
  * is BIT-PARITY against [[BpeReplay]] — the plain-Scala, Spark-free
  * third implementation of the same published algorithm — at IDENTICAL
  * constants on the full sf1 vocab: both the merge table (every (round,
  * rank, pair, merged, cnt) tuple) and the final per-word tokenization
  * must agree exactly. The loop itself stays oracle-certified at the
  * q138 constants by q142's DuckDB hash gate; this probe extends the
  * certified loop to the 32k scale. q143's per-source compression
  * report carries the report SHAPE under a full DuckDB oracle at the
  * certified table; this probe prints the same report from the 32k
  * table (replay-checked rather than SQL-checked).
  *
  * Constants: rounds is a CEILING, not a target — the vocab cap
  * (32768) stops merge accrual exactly there and later rounds no-op
  * for free (limit <= 0 skips the round in both implementations), so
  * the recorded wall is the time-to-32768-merges.
  *
  * Usage: sbt "Test/runMain graft.Bpe32kProbe [sf1Dir]".
  */
object Bpe32kProbe {

  val Rounds = 250
  val Batch = 4096
  val Cap = 32768
  val TopC = 16384

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Pipeline

    val units = Pipeline.bpeBigUnits(spark, d).localCheckpoint(true)
    println(s"PROBE bpe32k_vocab_rows=${units.count()}")

    val t0 = System.nanoTime()
    val m32 = Pipeline.trainBatchedNative(units, Rounds, Batch, Cap, TopC)
    val wall = (System.nanoTime() - t0) / 1e9
    val lastRound = m32.map(_._1).max
    println(f"PROBE bpe32k_train merges=${m32.size} wall=$wall%.1fs " +
      s"rounds_used=$lastRound (ceiling=$Rounds, cap=$Cap)")
    require(m32.size >= Cap,
      s"32k run reached only ${m32.size} merges (target $Cap)")

    // the independent in-memory replay at IDENTICAL constants — plain
    // Scala collections, no Spark anywhere in it
    val vocab = Pipeline.bpeBigWords(spark, d)
      .where(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("wcnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t1 = System.nanoTime()
    val (mRep, encRep) = BpeReplay.train(vocab, Rounds, Batch, Cap, TopC)
    val wallRep = (System.nanoTime() - t1) / 1e9
    println(f"PROBE bpe32k_replay merges=${mRep.size} wall=$wallRep%.1fs")
    require(m32 == mRep,
      "engine merge table diverged from the in-memory replay at 32k scale")

    // ENCODE parity: the native BpeEncode expression under the 32k
    // table must reproduce the replay's final tokenization for every
    // vocab word (token-count equality per word is the hash-shaped
    // reduction of it; counts pin the fold, parity above pins the table)
    val rounds = (1 to lastRound).map(r =>
      m32.filter(_._1 == r).sortBy(_._2).map(_._3))
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val toks = ColumnBridge.column(graft.functions.BpeEncode(
      ColumnBridge.expression(
        regexp_extract_all(col("w"), lit(".{1,2}"), lit(0))), rounds))
    val engineCounts = Pipeline.bpeBigWords(spark, d)
      .where(length(col("w")) >= 2).select(col("w")).distinct()
      .select(col("w"), size(toks).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val diverged = encRep.count { case (w, t) => engineCounts(w) != t.size }
    println(s"PROBE bpe32k_encode_parity diverged_words=$diverged " +
      s"(vocab=${encRep.size})")
    require(diverged == 0,
      "native encode under the 32k table diverged from the replay tokenization")

    // the q143-shaped per-source compression report from the 32k table
    val words = Pipeline.bpeBigWords(spark, d)
    val src = Tables(spark, d, "documents").select(col("doc_id"), col("source"))
    val wf = words.join(src, Seq("doc_id"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("wcnt"))
    val unitsCol = regexp_extract_all(col("w"), lit(".{1,2}"), lit(0))
    val toks2 = ColumnBridge.column(graft.functions.BpeEncode(
      ColumnBridge.expression(unitsCol), rounds))
    val report = wf
      .select(col("source"), col("wcnt"),
        size(unitsCol).cast("long").as("u"), size(toks2).cast("long").as("k"))
      .groupBy(col("source"))
      .agg(sum(col("wcnt")).as("words"),
        sum(col("u") * col("wcnt")).as("tokens_unit"),
        sum(col("k") * col("wcnt")).as("tokens_bpe"))
      .orderBy(col("source"))
      .collect()
    report.foreach(r => println(s"PROBE bpe32k_report source=${r.getString(0)} " +
      s"words=${r.getLong(1)} tokens_unit=${r.getLong(2)} tokens_bpe=${r.getLong(3)}"))

    spark.stop()
  }
}
