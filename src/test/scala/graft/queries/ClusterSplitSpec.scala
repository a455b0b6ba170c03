package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q121_cluster_split: leakage-proof train/valid/test assignment keyed
  * on the near-dup cluster id instead of the doc id.
  *
  * Besides the DuckDB oracle: a plain-Scala replay (union-find +
  * salted-md5 bucket), the leakage guarantee itself (every cluster's
  * members share one split), and proof the cluster keying is
  * load-bearing — on this fixture the q58-style doc-keyed bucket WOULD
  * have straddled a split boundary inside at least one cluster.
  */
class ClusterSplitSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def bucketOf(salt: String, key: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt$key".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % 100
  }

  private def splitOf(b: Long): String =
    if (b < 80) "train" else if (b < 90) "valid" else "test"

  private def clusters(): (Map[Long, Long], Map[Long, Long]) = {
    // (doc -> cluster_id incl. singletons, doc -> n_chars)
    val pairs = LlmText.bandedNearDupPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val chars = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (chars.keys.map(id => id -> (if (parent.contains(id)) find(id) else id)).toMap, chars)
  }

  test("q121 replays exactly from union-find + salted-md5 buckets") {
    val (cluster, chars) = clusters()
    val rows = cluster.toSeq.map { case (doc, cl) => (splitOf(bucketOf("csplit:", cl)), doc, cl) }
    val expect = rows.groupBy(_._1).map { case (sp, g) =>
      sp -> ((g.size.toLong, g.map(_._3).distinct.size.toLong, g.map(r => chars(r._2)).sum))
    }
    val got = SparkEntry.queries("q121_cluster_split")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("q121 leakage guarantee holds on the engine's per-doc assignment") {
    // collected from the ENGINE's own per-doc relation, not the replay
    val assigned = Pipeline.clusterSplitAssignment(spark, dir)
      .select(col("cluster_id"), col("split"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val multi = assigned.groupBy(_._1).filter(_._2.length >= 2)
    assert(multi.nonEmpty, "fixture has no multi-member cluster — the guarantee is vacuous")
    multi.foreach { case (cl, members) =>
      val splits = members.map(_._2).toSet
      assert(splits.size == 1, s"cluster $cl straddles splits $splits")
    }
  }

  test("q121 cluster keying is load-bearing: doc-keyed buckets would leak") {
    val (cluster, _) = clusters()
    val leaky = cluster.groupBy(_._2).filter(_._2.size >= 2).exists { case (_, members) =>
      members.keys.map(d => splitOf(bucketOf("csplit:", d))).toSet.size > 1
    }
    assert(leaky,
      "no cluster's members straddle a boundary under doc-keyed hashing — " +
        "the cluster keying never decided anything on this fixture")
  }
}
