package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q122_perceptron_classifier: distributed batch-perceptron training
  * of a hashed bag-of-words domain classifier (lang='en' vs rest),
  * exact integer math end to end.
  *
  * Third implementation: a plain-Scala replay of the whole trainer
  * (featurize → score → misclassify → delta → update, 3 rounds),
  * bit-for-bit against the engine's trajectory. Plus the learning
  * property: the trained model must classify better than the
  * all-misclassified start.
  */
class PerceptronSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"
  private val F = 64
  private val Rounds = 3

  private def bucketOf(tok: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ptron:$tok".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 8)
    (java.lang.Long.parseLong(hex, 16) % F).toInt
  }

  /** (round, bucket) -> (weight, n_miss), replayed in plain Scala. */
  private def replay(corpus: Seq[(Long, String, String)]): Map[(Long, Long), (Long, Long)] = {
    val feats = corpus.map { case (id, text, lang) =>
      val y = if (lang == "en") 1L else -1L
      val x = Array.fill(F + 1)(0L)
      text.split(" ", -1).filter(_.nonEmpty).foreach(t => x(bucketOf(t)) += 1)
      x(F) = 1L // bias
      (id, y, x)
    }
    val w = Array.fill(F + 1)(0L)
    val out = Map.newBuilder[(Long, Long), (Long, Long)]
    for (r <- 1 to Rounds) {
      val miss = feats.filter { case (_, y, x) =>
        y * (0 to F).map(b => w(b) * x(b)).sum <= 0
      }
      val nMiss = miss.size.toLong
      for (b <- 0 to F) w(b) += miss.map { case (_, y, x) => y * x(b) }.sum
      for (b <- 0 to F) out += ((r.toLong, b.toLong) -> ((w(b), nMiss)))
    }
    out.result()
  }

  private def corpus(): Seq[(Long, String, String)] =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("q122 trajectory replays bit-for-bit in plain Scala") {
    val expect = replay(corpus())
    val got = SparkEntry.queries("q122_perceptron_classifier")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect,
      s"diff=${(got.toSet -- expect.toSet).take(5)} / ${(expect.toSet -- got.toSet).take(5)}")
  }

  test("q122b confusion matrix replays from the trained weights") {
    val docs = corpus()
    val trained = replay(docs)
    val w = Array.tabulate(F + 1)(b => trained((Rounds.toLong, b.toLong))._1)
    val expect = docs.groupBy { case (_, text, lang) =>
      val y = if (lang == "en") 1L else -1L
      val x = Array.fill(F + 1)(0L)
      text.split(" ", -1).filter(_.nonEmpty).foreach(t => x(bucketOf(t)) += 1)
      x(F) = 1L
      val sc = (0 to F).map(b => w(b) * x(b)).sum
      (y, if (sc > 0) 1L else -1L)
    }.map { case (k, g) => k -> g.size.toLong }
    val got = SparkEntry.queries("q122b_perceptron_apply")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("q122 learns: trained model beats the all-misclassified start") {
    val docs = corpus()
    val trained = replay(docs)
    val w = Array.tabulate(F + 1)(b => trained((Rounds.toLong, b.toLong))._1)
    val correct = docs.count { case (_, text, lang) =>
      val y = if (lang == "en") 1L else -1L
      val x = Array.fill(F + 1)(0L)
      text.split(" ", -1).filter(_.nonEmpty).foreach(t => x(bucketOf(t)) += 1)
      x(F) = 1L
      y * (0 to F).map(b => w(b) * x(b)).sum > 0
    }
    // round 1 starts from w=0 where EVERY doc is misclassified; the
    // trained model must do strictly better than chance on the corpus
    assert(correct * 2 > docs.size,
      s"trained accuracy ${correct.toDouble / docs.size} not better than 0.5")
  }
}
