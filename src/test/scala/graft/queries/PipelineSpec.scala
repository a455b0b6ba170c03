package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline-query invariants beyond the DuckDB oracle gate: the splits
  * partition the corpus, the curation funnel conserves documents, the
  * two-pass heavy hitter matches an in-Spark exact recount, and the
  * composed funnel plans without any all-pairs join. */
class PipelineSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("q58 splits partition the corpus (nothing lost, nothing doubled)") {
    val total = Tables(spark, dir, "documents").count()
    val rows = SparkEntry.queries("q58_hash_split")(spark, dir).collect()
    assert(rows.map(_.getAs[String]("split")).toSet == Set("train", "valid", "test"))
    assert(rows.map(_.getAs[Long]("cnt")).sum == total)
  }

  test("q58 assignment is independent of partitioning (pure per-row function)") {
    // same split membership whether the corpus sits in 1, 7, or 32
    // partitions — the property rand()-based splits do NOT have
    def membership(parts: Int): Map[Long, String] =
      Pipeline.splitAssignment(Tables(spark, dir, "documents").repartition(parts))
        .select(col("doc_id"), col("split")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val baseline = membership(1)
    for (parts <- Seq(7, 32)) assert(membership(parts) == baseline,
      s"split assignment changed under repartition($parts)")
  }

  test("q61 funnel conserves documents per lang") {
    val perLang = Tables(spark, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val funnel = SparkEntry.queries("q61_curation_funnel")(spark, dir).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getAs[Long]("cnt")).sum).toMap
    assert(funnel == perLang)
  }

  test("q61 plans with no all-pairs join") {
    val plan = SparkEntry.queries("q61_curation_funnel")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "funnel must not plan a BNLJ")
    assert(!plan.contains("CartesianProduct"), "funnel must not plan a cartesian")
  }

  test("q74 packing conserves tokens and pack ids are contiguous per shard") {
    val total = Tables(spark, dir, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    val rows = SparkEntry.queries("q74_sequence_packing")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("sum_tokens")).sum == total,
      "every token must land in exactly one pack row")
    // packs within a shard are a contiguous 0-based range (concatenate-
    // then-chunk leaves no empty pack between occupied ones)
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rs) =>
      val packs = rs.map(_.getAs[Long]("pack")).sorted.toSeq
      assert(packs == (0L until packs.size), s"shard $shard packs not contiguous: $packs")
    }
  }

  test("q77 mixture weights sum to 1 within floor error and upweight small sources") {
    val rows = SparkEntry.queries("q77_mixture_weights")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val pSum = rows.map(_._3).sum
    assert(pSum <= 1000000L && pSum > 1000000L - rows.length,
      s"probabilities sum to $pSum, want (1e6 - n, 1e6]")
    // temperature alpha = 0.5 flattens: the smallest source's share of p
    // must exceed its share of tokens, the largest's must shrink
    val totTok = rows.map(_._2).sum
    val small = rows.minBy(_._2)
    val big = rows.maxBy(_._2)
    assert(small._3.toDouble / 1e6 > small._2.toDouble / totTok)
    assert(big._3.toDouble / 1e6 < big._2.toDouble / totTok)
  }

  test("q75 coverage is a valid per-doc fraction and flags the planted dup docs") {
    // exact-duplicate docs (q41's dup groups) share ALL their 8-grams,
    // so every member of a dup group must have coverage 1.0 — they are
    // the guaranteed-flagged population
    val rows = SparkEntry.queries("q75_span_coverage")(spark, dir).collect()
    rows.foreach { r =>
      val (n, flagged, avg) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_flagged"),
        r.getAs[Long]("avg_cov_e4"))
      assert(flagged <= n && avg >= 0L && avg <= 10000L)
    }
    val dupDocs = Tables(spark, dir, "documents")
      .groupBy(col("text")).agg(count(lit(1)).as("c"))
      .where(col("c") > 1).agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_flagged")).sum >= dupDocs / 2,
      "exact-dup docs share all 8-grams and must be flagged")
    assert(rows.map(_.getAs[Long]("n_flagged")).sum > 0,
      "fixture should contain flagged high-coverage docs")
  }

  test("q62 equals an exact in-Spark full recount") {
    val got = SparkEntry.queries("q62_heavy_hitters")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tok = Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val n = tok.count()
    val exact = tok.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * 40 > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
    assert(exact.nonEmpty, "fixture should have heavy hitters at n/40")
  }

  test("q79 chunking covers every token once to twice, counts match geometry") {
    // stride 48 < size 64: every token is in at least its own chunk and
    // in at most one overlap tail, so per-source token-slot totals land
    // in [n_tok, 2*n_tok]; chunk counts equal floor((n-1)/48)+1 per doc
    val perDoc = Tables(spark, dir, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expChunks = perDoc.groupBy(_._1).view
      .mapValues(_.map { case (_, n) => (n - 1) / 48 + 1 }.sum).toMap
    val tokTotals = perDoc.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val rows = SparkEntry.queries("q79_chunk_docs")(spark, dir).collect()
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_chunks") == expChunks(src),
        s"$src: chunk count disagrees with stride geometry")
      val slots = r.getAs[Long]("sum_chunk_toks")
      assert(slots >= tokTotals(src) && slots <= 2 * tokTotals(src),
        s"$src: token slots $slots outside [n, 2n] of ${tokTotals(src)}")
    }
  }

  test("q86 conserves documents per source and applies signal precedence") {
    val rows = SparkEntry.queries("q86_multi_signal_curation")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("cnt")))
    val perSource = Tables(spark, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(got == perSource, "every doc must get exactly one action")
    assert(rows.map(_._2).toSet.subsetOf(
      Set("keep", "drop_exact", "drop_lexical", "drop_semantic")))
    // drop_exact total equals the independently-computed non-min text copies
    val exactDups = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("text"))
      Tables(spark, dir, "documents")
        .withColumn("r", min(col("doc_id")).over(w))
        .where(col("doc_id") =!= col("r")).count()
    }
    assert(rows.filter(_._2 == "drop_exact").map(_._3).sum == exactDups)
    assert(rows.exists(_._2 == "keep"), "fixture must keep some documents")
  }

  test("q81 top pair matches an exact driver-side recount") {
    val texts = Tables(spark, dir, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split(" ").foreach { w =>
      if (w.length >= 2)
        (0 until w.length - 1).foreach { i =>
          val p = w.substring(i, i + 2)
          counts(p) = counts.getOrElse(p, 0L) + 1
        }
    })
    val exactTop = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    val got = SparkEntry.queries("q81_bpe_pair_counts")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("cnt")).toSeq
    assert(got == exactTop, "top-20 BPE pair table disagrees with exact recount")
    assert(got.forall(_._1.length == 2))
  }

  test("q97 PMI matches an exact recount and keeps quantization margin") {
    // recount unigrams/bigrams imperatively, recompute every PMI from
    // the same single-division form, and (Bm25Spec doctrine) assert the
    // scaled values land far from the floor(x·1e4 + 0.5) boundary so a
    // last-ulp libm difference cannot flip a digit
    val texts = Tables(spark, dir, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bi = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val w = t.split(" ").filter(_.nonEmpty)
      w.foreach(x => uni(x) = uni.getOrElse(x, 0L) + 1)
      w.sliding(2).foreach { p =>
        if (p.length == 2) bi((p(0), p(1))) = bi.getOrElse((p(0), p(1)), 0L) + 1 }
    }
    val tt = uni.values.sum
    val bt = bi.values.sum
    val pmi = bi.filter(_._2 >= 5).map { case ((a, b), cab) =>
      val x = (cab * tt * tt).toDouble / (bt * uni(a) * uni(b)).toDouble
      val scaled = math.log(x) * 10000
      // floor(scaled + 0.5) flips when (scaled + 0.5) crosses an
      // integer — require every fixture input to keep 1e-6 of margin
      val frac = (scaled + 0.5) - math.floor(scaled + 0.5)
      assert(math.min(frac, 1 - frac) > 1e-6,
        s"($a,$b) PMI $scaled sits within 1e-6 of the rounding boundary")
      (a, b) -> (cab, math.floor(scaled + 0.5).toLong)
    }
    val expect = pmi.toSeq.map { case ((a, b), (cab, p)) => (p, a, b, cab) }
      .sortBy { case (p, a, b, _) => (-p, a, b) }.take(20)
      .map { case (p, a, b, cab) => (a, b, cab, p) }
    val got = SparkEntry.queries("q97_pmi_pairs")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("cab"),
        r.getAs[Long]("pmi_e4"))).toSeq
    assert(got == expect, s"PMI top-20 disagrees:\n got $got\n exp $expect")
  }

  test("q94 sampler matches an exact driver-side replay of the rate rule") {
    // recompute rates and md5 membership imperatively; the smallest
    // (most-upweighted) source must keep every document
    val docs = Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).split(" ").length.toLong))
    val nTok = docs.groupBy(_._1).map { case (s, ds) => s -> ds.map(_._3).sum }
    val wMu = nTok.map { case (s, n) => s -> math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong }
    val wTot = wMu.values.sum
    val q0 = nTok.map { case (s, n) => s -> (wMu(s) * 1000000L / wTot) * 1000000L / n }
    val qm = q0.values.max
    val rates = q0.map { case (s, q) => s -> q * 1000000L / qm }
    def bucketE6(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"mix:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16) % 1000000L
    }
    val expect = docs.filter { case (s, id, _) => bucketE6(id) < rates(s) }
      .groupBy(_._1).map { case (s, ds) => s -> (ds.length.toLong, ds.map(_._3).sum) }
    val got = SparkEntry.queries("q94_mixture_sample")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("rate_e6"),
        r.getAs[Long]("kept_docs"), r.getAs[Long]("kept_tokens"))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (s, (nd, nt)) =>
      assert(got(s)._1 == rates(s), s"$s rate mismatch")
      assert((got(s)._2, got(s)._3) == (nd, nt), s"$s kept counts mismatch") }
    val smallest = nTok.minBy(_._2)._1
    assert(rates(smallest) == 1000000L, "most-upweighted source rate is not 1")
    assert(got(smallest)._2 == docs.count(_._1 == smallest).toLong,
      "most-upweighted source lost documents")
  }

  test("q91 encode matches a driver-side greedy re-tokenization with q81b's merges") {
    // apply the SAME learned merge table with an independent in-memory
    // BPE encoder (greedy left-to-right per merge, in rank order) and
    // recount every per-source total the query reports
    val merges = SparkEntry.queries("q81b_bpe_merge_training")(spark, dir).collect()
      .sortBy(_.getAs[Int]("round")).map(r => r.getString(1).split(" ", 2))
    def encode(w: String): Int = {
      var toks = w.split("").toSeq
      merges.foreach { case Array(a, b) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += a + b; i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.toSeq
      }
      toks.length
    }
    val expect = scala.collection.mutable.Map.empty[String, (Long, Long, Long)]
    Tables(spark, dir, "documents").select(col("source"), col("text")).collect()
      .foreach { r =>
        val src = r.getString(0)
        r.getString(1).split(" ").filter(_.nonEmpty).foreach { w =>
          val (ws, ch, tk) = expect.getOrElse(src, (0L, 0L, 0L))
          expect(src) = (ws + 1, ch + w.length, tk + encode(w))
        }
      }
    val got = SparkEntry.queries("q91_bpe_encode")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("words"), r.getAs[Long]("tokens_char"),
        r.getAs[Long]("tokens_bpe"), r.getAs[Long]("tokens_saved"))).toMap
    assert(got.keySet == expect.keySet, "per-source coverage differs")
    expect.foreach { case (src, (ws, ch, tk)) =>
      val (gw, gc, gt, gs) = got(src)
      assert((gw, gc, gt) == (ws, ch, tk),
        s"$src: got words=$gw chars=$gc toks=$gt, expected $ws/$ch/$tk")
      assert(gs == gc - gt, s"$src: tokens_saved inconsistent")
    }
    assert(got.values.map(_._4).sum > 0, "merges never applied — nothing saved")
  }

  test("q64b fractional contamination is consistent with q64's binary flag") {
    // every q64b row is a valid fraction; the exact-verbatim case
    // reads 10000; and restricting the top-20 to frac > 0 can never
    // exceed q64's corpus-wide contaminated count (the binary flag is
    // the fraction's support)
    val fr = graft.SparkEntry.queries("q64b_contamination_fraction")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(fr.nonEmpty)
    for ((id, ng, nh, f) <- fr) {
      assert(nh >= 0 && nh <= ng, s"doc $id: hits $nh outside [0, $ng]")
      assert(f == 10000 * nh / ng, s"doc $id: frac_e4 $f not the exact rational")
    }
    assert(fr.map(_._4).toSeq == fr.map(_._4).toSeq.sorted(Ordering[Long].reverse),
      "top-20 not sorted by fraction")
    val binary = graft.SparkEntry.queries("q64_contamination")(spark, dir)
      .collect().head.getLong(1)
    assert(fr.count(_._4 > 0) <= binary,
      "more fractionally-contaminated docs than q64's binary count")
    assert(fr.exists(_._4 > 0), "fixture drift: no contaminated test doc")
  }

  test("q64c fuzzy contamination crosses the split boundary and attributes the worst partner") {
    // run at sf0.01: the cross-split near-dup pair space at sf0.001 is
    // too small to be meaningful (expected pairs < 1)
    val d01 = "/root/testdata/sf0.01"
    def b(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"split:$id".getBytes("UTF-8"))
        .take(4).map(x => f"$x%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val rows = graft.SparkEntry.queries("q64c_fuzzy_contamination")(spark, d01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty, "fixture drift: no fuzzy-contaminated test doc at sf0.01")
    for ((te, tr, j) <- rows) {
      assert(b(te) >= 90, s"test doc $te not in the test split")
      assert(b(tr) < 80, s"train partner $tr not in the train split")
      assert(j >= 0.5, s"pair ($te, $tr) below the fuzzy bar: $j")
    }
    // attribution replay: for each contaminated doc, the reported
    // partner is the (jaccard desc, id asc) argmax over ALL its
    // cross-split pairs in the shared verified relation
    val pairs = graft.queries.LlmText.bandedNearDupPairs(spark, d01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = pairs.filter(_._3 >= 0.5).flatMap { case (a, bb, j) =>
      Seq((a, bb, j), (bb, a, j)) }
      .filter { case (tr, te, _) => b(tr) < 80 && b(te) >= 90 }
      .groupBy(_._2).map { case (te, ps) =>
        val best = ps.minBy { case (tr, _, j) => (-j, tr) }
        (te, best._1, best._3)
      }.toSet
    assert(rows.toSet == expect, "attribution diverges from the pair-relation replay")
  }

  test("q134 curriculum phases partition the corpus and order by difficulty") {
    val rows = SparkEntry.queries("q134_curriculum_phases")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = Tables(spark, dir, "documents").count()
    assert(rows.map(_._3).sum == total,
      "every doc must land in exactly one curriculum phase")
    val phases = rows.map(_._1).distinct.sorted
    assert(phases.length >= 2, s"degenerate banding on fixture: $phases")
    // the schedule is real: per-phase token-weighted mean surprisal is
    // strictly increasing easy -> hard
    def phaseMean(p: String): Double = {
      val ps = rows.filter(_._1 == p)
      ps.map(r => r._5.toDouble * r._4).sum / ps.map(_._4).sum
    }
    val means = phases.toSeq.map(phaseMean)
    assert(means == means.sorted && means.distinct.length == means.length,
      s"phase means not strictly increasing: ${phases.toSeq.zip(means)}")
  }
}
