package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed SUFFIX-ARRAY analytics over `documents` — the exact
  * substring-duplication layer the gram-hash family (q112/q112b) can
  * only approximate at fixed resolutions.
  *
  * q112 answers "which tokens are covered by a repeated n-gram?" for a
  * CHOSEN n. A suffix array answers the stronger question Lee et al.
  * 2022 ("Deduplicating Training Data Makes Language Models Better",
  * the ExactSubstr method) actually pose: for every position, how LONG
  * is the longest substring starting there that occurs anywhere else in
  * the corpus — no resolution parameter, and it exposes the maximal
  * repeats themselves (the boilerplate strings a curation report wants
  * to show, not just count).
  *
  * Construction (all deterministic, oracle-checkable):
  *  1. one scan explodes each doc into its token-suffix positions; the
  *     sort key is the suffix capped at [[Depth]] tokens, space-joined
  *     (tokens never contain blanks, and ' ' sorts below every token
  *     byte, so string order == token-sequence order — both engines
  *     compare binary UTF-8);
  *  2. a RANGE repartition + in-partition sort realizes the global
  *     suffix order, and `zipWithIndex` assigns the contiguous rank —
  *     the scale-safe global-index pattern (per-partition counts +
  *     driver prefix-sum over numPartitions values), NOT a
  *     single-partition row_number window; partition boundaries don't
  *     affect the rank because the order is total;
  *  3. neighbours in suffix order meet by a rank/rank+1 equi-join and
  *     each adjacent pair's LCP is one array fold — the classic SA fact
  *     that a suffix's longest match anywhere in the corpus is attained
  *     at one of its two rank-neighbours makes adjacent pairs
  *     sufficient.
  *
  * Why this survives 100 TB: the only quadratic-looking object — "all
  * suffixes" — is linear×[[Depth]] in corpus size, the same blowup
  * class as n-gram shingling at n = Depth. Capping the sort key at
  * Depth keeps every reported match length EXACT below Depth and
  * clamps longer ones to Depth (ties broken by (doc_id, pos) keep the
  * order total); a dedup threshold is always far below Depth, so the
  * cap never changes a curation decision. The uncapped alternative at
  * scale is prefix-doubling (O(log n) sort rounds), which buys nothing
  * here: fixture docs are ≤ 100 tokens < Depth, so these results are
  * the exact uncapped answers. No n² pair space exists anywhere —
  * adjacency in rank order replaces candidate pairing entirely.
  */
object SuffixArray {

  private def docs(s: SparkSession, d: String): DataFrame = Tables(s, d, "documents")

  /** Match-depth cap (tokens): matches shorter than Depth are exact,
    * longer ones report Depth. Fixture docs are ≤ 100 tokens, so the
    * cap never binds at any test tier. */
  private[graft] val Depth = 128

  /** Session cache of the adjacent-pair LCP relation — two consumers
    * (q125, q125b) share one suffix sort; lineage truncated per the
    * round-8 localCheckpoint doctrine (a persisted multi-reference
    * relation still re-plans its full tree per reference). */
  private val lcpCache = new graft.SessionCache[DataFrame](
    df => df.unpersist(blocking = false))

  private[graft] def adjacentLcp(s: SparkSession, d: String): DataFrame =
    lcpCache.getOrElseUpdate(s, d, adjacentLcpOf(docs(s, d)).localCheckpoint(true))

  /** Ranked suffix relation (doc_id, n_tokens, pos, prev, sfx, rk):
    * pos is 1-based, prev is the token before pos (NULL at doc start —
    * the left-maximality witness), sfx the Depth-capped token suffix,
    * rk the contiguous global rank in (suffix, doc_id, pos) order. */
  /** The globally-ordered suffix relation BEFORE rank assignment —
    * exposed so PlanSpec can pin its shape (one scan, one range
    * exchange, zero joins); [[rankedSuffixesOf]]'s zipWithIndex hides
    * this plan behind a LogicalRDD. */
  private[graft] def sortedSuffixesOf(docsDf: DataFrame): DataFrame = {
    val sfx = docsDf
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"), col("t"),
        explode(expr("sequence(1, size(t))")).as("pos"))
      .select(col("doc_id"), col("n_tokens"), col("pos"),
        when(col("pos") === 1, lit(null).cast("string"))
          .otherwise(element_at(col("t"), col("pos") - 1)).as("prev"),
        expr(s"slice(t, pos, $Depth)").as("sfx"))
      .withColumn("ss", concat_ws(" ", col("sfx")))
    val parts = sfx.sparkSession.sessionState.conf.numShufflePartitions
    sfx.repartitionByRange(parts, col("ss"), col("doc_id"), col("pos"))
      .sortWithinPartitions(col("ss"), col("doc_id"), col("pos"))
      .drop("ss") // sort applied; don't ship the key bytes twice from here on
  }

  private[graft] def rankedSuffixesOf(docsDf: DataFrame): DataFrame = {
    val sorted = sortedSuffixesOf(docsDf)
    val schema = sorted.schema.add("rk", LongType, nullable = false)
    sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
  }

  /** Adjacent suffix pairs with their LCP (in tokens) and the repeated
    * prefix itself: (da, pa, na, va, db, pb, nb, vb, lcp, snippet).
    * The LCP fold walks both arrays once; `acc = i` gates the increment
    * so the first mismatch freezes the count. */
  private[graft] def adjacentLcpOf(docsDf: DataFrame): DataFrame = {
    val r = rankedSuffixesOf(docsDf)
    val a = r.select(col("rk"), col("doc_id").as("da"), col("pos").as("pa"),
      col("n_tokens").as("na"), col("prev").as("va"), col("sfx").as("sa"))
    val b = r.select((col("rk") - 1).as("rk"), col("doc_id").as("db"), col("pos").as("pb"),
      col("n_tokens").as("nb"), col("prev").as("vb"), col("sfx").as("sb"))
    a.join(b, Seq("rk"))
      .withColumn("lcp", expr(
        "CAST(aggregate(sequence(0, least(size(sa), size(sb)) - 1), 0, " +
          "(acc, i) -> IF(acc = i AND sa[i] = sb[i], acc + 1, acc)) AS BIGINT)"))
      .withColumn("snippet", expr("concat_ws(' ', slice(sa, 1, CAST(lcp AS INT)))"))
      .drop("sa", "sb", "rk")
  }

  /** DuckDB replay of the ranked-suffix + adjacent-LCP construction,
    * ending in CTE `l(da, pa, na, va, db, pb, nb, vb, lcp, snippet)`. */
  private val LcpSqlCtes: String =
    "toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents), " +
      "p AS (SELECT doc_id, len(t) AS n_tokens, i AS pos, " +
      "CASE WHEN i = 1 THEN NULL ELSE t[i-1] END AS prev, " +
      s"t[i:i+${Depth - 1}] AS sfx FROM toks, UNNEST(range(1, len(t)+1)) AS u(i)), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY array_to_string(sfx,' '), doc_id, pos) AS rk FROM p), " +
      "adj AS (SELECT a.doc_id AS da, a.pos AS pa, a.n_tokens AS na, a.prev AS va, a.sfx AS sa, " +
      "b.doc_id AS db, b.pos AS pb, b.n_tokens AS nb, b.prev AS vb, b.sfx AS sb " +
      "FROM r a JOIN r b ON b.rk = a.rk + 1), " +
      "l AS (SELECT da, pa, na, va, db, pb, nb, vb, " +
      "COALESCE(list_filter(range(1, LEAST(len(sa), len(sb)) + 1), i -> sa[i] != sb[i])[1] - 1, " +
      "LEAST(len(sa), len(sb))) AS lcp, " +
      "array_to_string(sa[1:COALESCE(list_filter(range(1, LEAST(len(sa), len(sb)) + 1), " +
      "i -> sa[i] != sb[i])[1] - 1, LEAST(len(sa), len(sb)))], ' ') AS snippet FROM adj)"

  /** q125 body over a prepared LCP relation (spec entry point for
    * synthetic corpora — the entries and the spec run the SAME logic). */
  private[graft] def longestDupPerDoc(l: DataFrame): DataFrame = {
    val sides = l.select(col("da").as("doc_id"), col("na").as("n_tokens"), col("lcp"))
      .union(l.select(col("db"), col("nb"), col("lcp")))
    sides.groupBy(col("doc_id"))
      .agg(max(col("lcp")).as("max_dup"), max(col("n_tokens")).as("n_tokens"))
      .where(col("max_dup") >= 5)
      .select(col("doc_id"), col("max_dup"), col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** q125b body over a prepared LCP relation: the k longest repeat
    * CLASSES that are cross-document and left-maximal, judged across
    * ALL occurrences of each class (ADVICE r9: the per-adjacent-pair
    * test dropped a genuinely left-maximal repeat when its only
    * cross-doc rank-adjacent pair happened to share a preceding token
    * while the distinct-context occurrence was non-adjacent).
    *
    * Three stages, all linear in the REPEATED portion of the corpus:
    *  1. candidates = distinct (lcp, snippet) of pairs with lcp ≥
    *     minLen. Every right-maximal repeat string w appears here: the
    *     minimum pair-lcp over w's occurrence interval is exactly |w|
    *     (two occurrences diverge right after w), and conversely every
    *     pair snippet is right-maximal (its own pair diverges at
    *     lcp+1). Non-right-maximal prefixes never become candidates.
    *  2. per-class ∃-flags from ADJACENT PAIRS only — no occurrence
    *     gathering. w's occurrences form a CONTIGUOUS rank interval,
    *     and the pairs with lcp ≥ |w| whose snippet has prefix w are
    *     exactly that interval's internal pairs. Over a contiguous
    *     chain, "all occurrences share one value" fails iff some
    *     ADJACENT pair differs (equality is transitive along the
    *     chain), so: cross-document ⟺ ∃ interval pair with da ≠ db;
    *     left-maximal ⟺ ∃ interval pair with differing or NULL
    *     (doc-start) preceding tokens. Each pair contributes one
    *     (len, prefix-hash, 2 bits) row per candidate length ≤ its
    *     lcp — the grouping key is a 64-bit xxhash of the prefix
    *     (Spark-internal, the h60 collision-free doctrine; the DuckDB
    *     oracle groups by the string itself), so the shuffle moves
    *     longs, never the up-to-Depth-token strings. (The previous
    *     occurrence-based form deduped and countDistinct'ed the full
    *     string-keyed occurrence explosion — measured 4.0 s at sf0.1
    *     vs 1.3 s for this shape, same rows out.)
    *  3. flags-qualified classes semi-join back to candidates (on the
    *     same prefix hash) — keeping only right-maximal strings —
    *     then top-k by (length, snippet). */
  private[graft] def topRepeats(l: DataFrame, minLen: Int = 10, k: Int = 20): DataFrame = {
    val rep = l.where(col("lcp") >= minLen)
      .withColumn("sn_toks", split(col("snippet"), " "))
    val cand = rep.select(col("lcp").as("len"), col("snippet")).distinct()
    val lens = cand.select(col("len")).distinct() // ≤ Depth rows → broadcast
    val flagged = rep.join(broadcast(lens), col("lcp") >= col("len"))
      .select(col("len"),
        xxhash64(array_join(
          slice(col("sn_toks"), lit(1), col("len").cast("int")), " ")).as("wh"),
        (col("da") =!= col("db")).cast("int").as("xd"),
        (col("va").isNull || col("vb").isNull || col("va") =!= col("vb"))
          .cast("int").as("xl"))
    val cls = flagged.groupBy(col("len"), col("wh"))
      .agg(max(col("xd")).as("xd"), max(col("xl")).as("xl"))
      .where(col("xd") === 1 && col("xl") === 1)
    cand.join(cls,
        cand("len") === cls("len") && xxhash64(cand("snippet")) === cls("wh"),
        "left_semi")
      .select(col("len").as("dup_tokens"), col("snippet"))
      .orderBy(col("dup_tokens").desc, col("snippet"))
      .limit(k)
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q125_longest_dup_substring",
      // Per doc: the longest token span that also occurs at ANY other
      // corpus position (either document) — the Lee et al. ExactSubstr
      // statistic without q112's fixed-n resolution. A position's best
      // match is the max LCP with its two rank-neighbours; per-doc max
      // over positions, reported for docs with a repeat ≥ 5 tokens
      // (q112's resolution floor, for comparability).
      (s, d) => longestDupPerDoc(adjacentLcp(s, d)),
      Some("WITH " + LcpSqlCtes + ", " +
        "sides AS (SELECT da AS doc_id, na AS n_tokens, lcp FROM l " +
        "UNION ALL SELECT db, nb, lcp FROM l) " +
        "SELECT doc_id, MAX(lcp) AS max_dup, MAX(n_tokens) AS n_tokens FROM sides " +
        "GROUP BY doc_id HAVING MAX(lcp) >= 5 ORDER BY doc_id")),

    QueryDef("q125b_top_repeated_substrings",
      // The boilerplate report: the 20 longest LEFT-MAXIMAL substrings
      // shared across documents (≥ 10 tokens). Left-maximality — not
      // every occurrence shares the same preceding token — kills the
      // shifted-suffix cascade (a 90-token repeat would otherwise also
      // surface as its own 89-, 88-, … token suffixes);
      // right-maximality holds for every candidate by construction
      // (its generating pair diverges right after the LCP). Both tests
      // are CLASS-level, over all occurrences of a repeat (see
      // [[topRepeats]]): a repeat with 3+ occurrences is judged on its
      // full preceding-token set, not on whichever two occurrences
      // happen to be rank-adjacent. A doc-start occurrence (NULL
      // witness) is maximal by definition — it cannot extend left.
      (s, d) => topRepeats(adjacentLcp(s, d)),
      Some("WITH " + LcpSqlCtes + ", " +
        "rep AS (SELECT * FROM l WHERE lcp >= 10), " +
        "cand AS (SELECT DISTINCT lcp AS len, snippet FROM rep), " +
        "lens AS (SELECT DISTINCT len FROM cand), " +
        "fl AS (SELECT ln.len, " +
        "array_to_string(list_slice(string_split(p.snippet, ' '), 1, ln.len), ' ') AS w, " +
        "CASE WHEN p.da <> p.db THEN 1 ELSE 0 END AS xd, " +
        "CASE WHEN p.va IS NULL OR p.vb IS NULL OR p.va <> p.vb THEN 1 ELSE 0 END AS xl " +
        "FROM rep p JOIN lens ln ON p.lcp >= ln.len), " +
        "cls AS (SELECT len, w FROM fl GROUP BY len, w " +
        "HAVING MAX(xd) = 1 AND MAX(xl) = 1) " +
        "SELECT c.len AS dup_tokens, c.snippet FROM cand c " +
        "JOIN cls x ON x.len = c.len AND x.w = c.snippet " +
        "ORDER BY dup_tokens DESC, snippet LIMIT 20")))
}
