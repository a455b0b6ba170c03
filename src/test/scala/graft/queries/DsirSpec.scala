package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q118 DSIR selection: a plain-Scala replay of the WHOLE pipeline
  * (hashed n-gram featurization, smoothed target/raw bucket ratios,
  * 1e-6-nat quantization, per-doc integer weight sum, top-40), the
  * Bm25-style boundary-margin guard on every fixture bucket's single
  * `ln` input, and the property the method exists for: selection is
  * target-seeking. */
class DsirSpec extends AnyFunSuite with SparkTestSession {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
  private val F = 1024

  private def bucket(g: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"dsir:$g".getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16) % F
  }

  /** (doc_id, lang, source, n_feat, dsir_e6) for EVERY doc, plus the
    * per-bucket exact (num, den) ln inputs for the margin guard. */
  private def replay(dir: String): (Seq[(Long, String, String, Long, Long)], Seq[(Long, Long)]) = {
    val docsRows = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3).split(" ").filter(_.nonEmpty).toVector))
    val feats = docsRows.map { case (id, lang, src, t) =>
      val grams = t ++ t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
      (id, lang, src, grams.map(bucket))
    }
    val cr = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val ct = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((_, lang, _, bs) <- feats; b <- bs) {
      cr(b) += 1; if (lang == "en") ct(b) += 1
    }
    val tr = cr.values.sum
    val tt = ct.values.sum
    val lnInputs = cr.keys.toSeq.sorted.map { b =>
      ((ct(b) + 1) * (tr + F), (cr(b) + 1) * (tt + F))
    }
    val lr = cr.keys.map { b =>
      val x = math.log(((ct(b) + 1) * (tr + F)).toDouble /
        ((cr(b) + 1) * (tt + F)).toDouble) * 1e6 + 0.5
      b -> math.floor(x).toLong
    }.toMap
    val weights = feats.map { case (id, lang, src, bs) =>
      (id, lang, src, bs.length.toLong, bs.map(lr).sum)
    }
    (weights.toSeq, lnInputs)
  }

  test("q118 matches an independent driver-side DSIR replay (top-40)") {
    for (dir <- dirs) {
      val (weights, _) = replay(dir)
      val expect = weights.sortBy { case (id, _, _, _, w) => (-w, id) }.take(40)
      val got = SparkEntry.queries("q118_dsir_selection")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getAs[Long]("n_feat"), r.getAs[Long]("dsir_e6"))).toSeq
      assert(got == expect, s"$dir: top-40 disagrees:\n got $got\n exp $expect")
    }
  }

  test("fixture bucket ln inputs land far from the 1e-6 quantization boundary") {
    // one ln per bucket; a floor flip needs the argument within ~1 ulp
    // (≈4e-10 at this magnitude) of an integer — assert every ACTUAL
    // fixture bucket keeps 1e-5, ~10⁴ ulps of headroom (measured min
    // across tiers: 1.4e-4)
    for (dir <- dirs) {
      val (_, lnInputs) = replay(dir)
      assert(lnInputs.nonEmpty)
      for ((num, den) <- lnInputs) {
        val x = math.log(num.toDouble / den.toDouble) * 1e6 + 0.5
        val margin = math.abs(x - math.rint(x))
        assert(margin > 1e-5, s"$dir bucket ln($num/$den) margin $margin too small")
      }
    }
  }

  test("q118 selection is target-seeking") {
    for (dir <- dirs) {
      val (weights, _) = replay(dir)
      val enFrac = weights.count(_._2 == "en").toDouble / weights.length
      val top = weights.sortBy { case (id, _, _, _, w) => (-w, id) }.take(40)
      val topEnFrac = top.count(_._2 == "en").toDouble / top.length
      assert(topEnFrac > enFrac,
        s"$dir: top-40 en fraction $topEnFrac not above corpus $enFrac")
      val (en, rest) = weights.partition(_._2 == "en")
      def mean(xs: Seq[(Long, String, String, Long, Long)]) =
        xs.map(_._5).sum.toDouble / xs.length
      assert(mean(en) > mean(rest),
        s"$dir: mean target weight not above mean non-target weight")
    }
  }
}
