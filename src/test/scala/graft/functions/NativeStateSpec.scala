package graft.functions

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The zero-shuffle near-dup state build (MinHashSig + ShingleSet
  * native expressions) must be byte-identical to the declarative
  * explode → group-by chain it replaced — replayed here verbatim (the
  * pre-round-11 nearDupState body) and compared per doc for BOTH
  * designs in use: bigram 16-hash (q54/q57/q66 family) and 3-gram
  * 8-hash (q44). Edge docs (empty text, one token, exactly n tokens,
  * duplicate shingles) ride along in a synthetic frame. */
class NativeStateSpec extends AnyFunSuite with SparkTestSession {

  /** The old declarative chain, kept verbatim as the reference. */
  private def oldChain(docsDf: DataFrame, n: Int, nHashes: Int): DataFrame = {
    val raw = docsDf.select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(t)-$n), i -> concat_ws(' ', ${(0 until n).map(k => s"t[i+$k]").mkString(", ")}))"
      )).as("sh"))
    val hashed = raw.select(col("doc_id") +:
      xxhash64(col("sh")).as("h60") +:
      (0 until nHashes).map { i =>
        val salt = s"${('a' + i / 4).toChar}:"
        val m = md5(concat(lit(salt), col("sh")))
        conv(substring(m, 1 + 8 * (i % 4), 8), 16, 10).cast("long").as(s"x$i")
      }: _*)
    val aggs = sort_array(collect_set(col("h60"))).as("hs") +:
      (0 until nHashes).map(i => min(col(s"x$i")).as(s"h$i"))
    hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .withColumn("nbg", size(col("hs")))
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map {
      case s: Seq[_] => s.mkString("[", ",", "]")
      case v => String.valueOf(v)
    }.mkString("|")).toSet

  private def compare(docs: DataFrame, n: Int, nHashes: Int): Unit = {
    val native = graft.queries.LlmText.nearDupState(docs, n, nHashes)
    val old = oldChain(docs, n, nHashes)
    assert(native.columns.toSeq == old.columns.toSeq)
    assert(rows(native) == rows(old), s"state mismatch at n=$n nHashes=$nHashes")
  }

  test("native state equals the declarative chain on the fixture, both designs") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    compare(docs, 2, 16)
    compare(docs, 3, 8)
  }

  test("native state equals the declarative chain on 200 seeded-random texts") {
    import spark.implicits._
    // randomized cross-check with multibyte/CJK/emoji tokens — the
    // kernel hashes UTF-8 bytes and xxhash64 a UTF8String, both of
    // which only coincide with the declarative chain if encoding is
    // handled identically (incl. surrogate pairs)
    val rnd = new scala.util.Random(12345)
    def tok(): String = rnd.nextInt(6) match {
      case 0 => "" // empty token — double spaces in the joined text
      case 1 => "é" * (1 + rnd.nextInt(3))
      case 2 => rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString
      case 3 => "日本語"
      case 4 => "😀🚀" // supplementary-plane code points (surrogate pairs)
      case 5 => rnd.nextInt(1000).toString
    }
    val docs = (1 to 200).map(i =>
        (i.toLong, Seq.fill(rnd.nextInt(30))(tok()).mkString(" ")))
      .toDF("doc_id", "text")
      .localCheckpoint(true)
    compare(docs, 2, 16)
    compare(docs, 3, 8)
  }

  test("native state equals the declarative chain on edge docs") {
    import spark.implicits._
    val docs = Seq(
      1L -> "", // zero tokens after split: [""] — one token, no bigram
      2L -> "solo",
      3L -> "two tokens",
      4L -> "a a a a a a", // duplicate shingles collapse in hs
      5L -> "x  y", // double space: empty middle token
      6L -> (1 to 200).map(i => s"w$i").mkString(" "))
      .toDF("doc_id", "text")
    compare(docs, 2, 16)
    compare(docs, 3, 8)
  }
}
