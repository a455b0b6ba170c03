package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 VALIDATION-fixture generator (test scope, VERDICT r9 item 5).
  *
  * The driver fixtures stop at sf0.1 and /root/testdata is read-only,
  * so the 10× tier is DERIVED deterministically from sf0.1 into the
  * repo's tmp/ dir — a scale-validation artifact (cap headrooms, bench
  * at 10×), NOT a driver correctness tier. Derivation per copy
  * c ∈ 0..9 (c = 0 is the original):
  *
  *  - every key column shifts by c·10⁷ (all sf0.1 key maxima ≪ 10⁷),
  *    so intra-copy join structure and selectivities are preserved and
  *    copies never collide;
  *  - `documents.text` tokens get a per-copy suffix (`tok_c3`) for
  *    c ≥ 1: each copy keeps the original's internal duplication
  *    structure (same dup lines, same near-dup families, same Zipf
  *    shape) while copies stay shingle-disjoint — the cross-copy
  *    INDEPENDENT-corpus model. ScaleProbe separately measures the
  *    adversarial IDENTICAL-copy model (10-way dup families) for the
  *    cap stress;
  *  - `embeddings.embedding` rotates left by c components: unit norms
  *    and the distribution shape survive, copies decorrelate;
  *  - `events` densifies 10× in the same time window (ids shifted,
  *    timestamps kept — the scale shape of a busier site);
  *  - `nation`/`region` stay single-copy (dimensions).
  *
  * Usage: sbt "Test/runMain graft.GenScale [outDir] [copies] [mode]".
  * `mode = vectors` writes ONLY the embeddings table (the 100k-vector
  * tier for the LSH code-width rule's next widening step — the other
  * tables would be dead weight there); default writes all tables.
  */
object GenScale {

  val KeyShift = 10000000L

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/tmp/sf1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val mode = if (args.length > 2) args(2) else "all"
    require(copies <= 64, "embedding rotation is by c components; c must stay < 64")
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // single part file per table, flattened to <out>/<name>.parquet as a
    // PLAIN FILE (both graft.Tables and tools/check.py's read_parquet
    // take that path shape; Spark still splits one file by row group)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    def flatten(name: String): Unit = {
      val dir = new java.io.File(s"$out/.tmp_$name")
      val part = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(s"$out/$name.parquet")
      if (dest.exists()) rm(dest)
      java.nio.file.Files.move(part.toPath, dest.toPath)
      rm(dir)
    }
    // single-part by contract: flatten() moves exactly one part file to
    // the plain-file path shape Tables/check.py expect (ADVICE r10: the
    // old per-table `parts` argument was dead — coalesce(1) always won)
    def copyUnion(name: String)(one: (DataFrame, Int) => DataFrame): Unit = {
      val base = Tables(spark, src, name)
      (0 until copies).map(c => one(base, c)).reduce(_ unionByName _)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$out/.tmp_$name")
      flatten(name)
      println(s"[genscale] wrote $name x$copies")
    }
    def shift(c: Int)(col0: org.apache.spark.sql.Column) = col0 + lit(c * KeyShift)

    if (mode == "vectors") {
      copyUnion("embeddings") { (df, c) =>
        val rotated = if (c == 0) df else df.withColumn("embedding",
          expr(s"concat(slice(embedding, ${c + 1}, ${64 - c}), slice(embedding, 1, $c))"))
        rotated.withColumn("vec_id", shift(c)(col("vec_id")))
      }
      spark.stop()
      return
    }

    Seq("region", "nation").foreach { name =>
      Tables(spark, src, name).coalesce(1)
        .write.mode("overwrite").parquet(s"$out/.tmp_$name")
      flatten(name)
      println(s"[genscale] wrote $name x1")
    }
    copyUnion("customer") { (df, c) =>
      df.withColumn("c_custkey", shift(c)(col("c_custkey")))
    }
    copyUnion("supplier") { (df, c) =>
      df.withColumn("s_suppkey", shift(c)(col("s_suppkey")))
    }
    copyUnion("part") { (df, c) =>
      df.withColumn("p_partkey", shift(c)(col("p_partkey")))
    }
    copyUnion("orders") { (df, c) =>
      df.withColumn("o_orderkey", shift(c)(col("o_orderkey")))
        .withColumn("o_custkey", shift(c)(col("o_custkey")))
    }
    copyUnion("lineitem") { (df, c) =>
      df.withColumn("l_orderkey", shift(c)(col("l_orderkey")))
        .withColumn("l_partkey", shift(c)(col("l_partkey")))
        .withColumn("l_suppkey", shift(c)(col("l_suppkey")))
    }
    copyUnion("events") { (df, c) =>
      df.withColumn("event_id", shift(c)(col("event_id")))
        .withColumn("user_id", shift(c)(col("user_id")))
    }
    copyUnion("documents") { (df, c) =>
      val texted = if (c == 0) df else df.withColumn("text",
        expr(s"array_join(transform(split(text, ' '), t -> concat(t, '_c$c')), ' ')"))
      texted.withColumn("doc_id", shift(c)(col("doc_id")))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    copyUnion("embeddings") { (df, c) =>
      val rotated = if (c == 0) df else df.withColumn("embedding",
        expr(s"concat(slice(embedding, ${c + 1}, ${64 - c}), slice(embedding, 1, $c))"))
      rotated.withColumn("vec_id", shift(c)(col("vec_id")))
    }
    spark.stop()
  }
}
