package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AnnIndexStore (q139/q140/q141/qc19): the FAISS write_index/
  * read_index analog — component round-trip fidelity, the manifest
  * commit protocol (written last, required on load, version-checked),
  * and the fresh-session serve claim at the store level. */
class AnnIndexStoreSpec extends AnyFunSuite with SparkTestSession {

  private def cents = Seq(
    KMeansLloyd.Centroid(0, Array(1L, -2L, 3L)),
    KMeansLloyd.Centroid(1, Array(-7L, 0L, 9L)))

  private def books = Seq(
    Seq(KMeansLloyd.Centroid(0, Array(1L, 2L)),
      KMeansLloyd.Centroid(1, Array(3L, 4L))),
    Seq(KMeansLloyd.Centroid(0, Array(-5L, 6L)),
      KMeansLloyd.Centroid(1, Array(7L, -8L))))

  test("ivf save/load round-trips centroids and members bit-exactly") {
    import spark.implicits._
    val dir = graft.util.Scratch.dir("annstore-spec")
    val members = Seq((10L, 0), (11L, 1), (12L, 0)).toDF("vec_id", "cell")
    AnnIndexStore.saveIvf(spark, dir, cents, members)
    val man = AnnIndexStore.loadManifest(dir)
    assert(man.kind == AnnIndexStore.KindIvf && man.k == 2)
    val c2 = AnnIndexStore.loadCentroids(spark, dir)
    assert(c2.map(_.cell) == Seq(0, 1))
    assert(c2.map(_.ci.toSeq) == cents.map(_.ci.toSeq))
    val m2 = AnnIndexStore.loadMembers(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(m2 == Set((10L, 0), (11L, 1), (12L, 0)))
  }

  test("ivfpq save/load round-trips codebooks (per-subspace, code-ordered) and codes") {
    import spark.implicits._
    val dir = graft.util.Scratch.dir("annstore-spec")
    val codes = Seq((10L, 0, 0, 1), (10L, 0, 1, 0), (11L, 1, 0, 0),
      (11L, 1, 1, 1)).toDF("vec_id", "cell", "sub", "code")
    AnnIndexStore.saveIvfPq(spark, dir, AnnIndexStore.KindIvfPq,
      cents, books, codes)
    val man = AnnIndexStore.loadManifest(dir)
    assert(man.m == 2 && man.ksub == 2 && man.subDim == 2)
    val b2 = AnnIndexStore.loadBooks(spark, dir)
    assert(b2.size == 2)
    assert(b2.map(_.map(_.ci.toSeq)) == books.map(_.map(_.ci.toSeq)))
    val got = AnnIndexStore.loadCodes(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(got == Set((10L, 0, 0, 1), (10L, 0, 1, 0), (11L, 1, 0, 0),
      (11L, 1, 1, 1)))
  }

  test("an uncommitted directory (no manifest) is invisible to load") {
    val dir = graft.util.Scratch.dir("annstore-spec")
    // simulate a crash mid-save: components exist, manifest never landed
    import spark.implicits._
    Seq((0, Seq(1L))).toDF("cell", "ci")
      .write.mode("overwrite").parquet(s"$dir/coarse_centroids")
    assert(!AnnIndexStore.committed(dir))
    val e = intercept[IllegalArgumentException](AnnIndexStore.loadManifest(dir))
    assert(e.getMessage.contains("manifest.json absent"))
  }

  test("a format-version mismatch fails loudly instead of misreading") {
    import spark.implicits._
    val dir = graft.util.Scratch.dir("annstore-spec")
    AnnIndexStore.saveIvf(spark, dir, cents,
      Seq((1L, 0)).toDF("vec_id", "cell"))
    val p = java.nio.file.Paths.get(dir, "manifest.json")
    val json = new String(java.nio.file.Files.readAllBytes(p))
    java.nio.file.Files.write(p, json.replace(
      s""""formatVersion":${AnnIndexStore.FormatVersion}""",
      s""""formatVersion":${AnnIndexStore.FormatVersion + 9}""").getBytes)
    val e = intercept[IllegalArgumentException](AnnIndexStore.loadManifest(dir))
    assert(e.getMessage.contains("format"))
  }

  test("re-save overwrites atomically: manifest deleted first, written last") {
    import spark.implicits._
    val dir = graft.util.Scratch.dir("annstore-spec")
    AnnIndexStore.saveIvf(spark, dir, cents,
      Seq((1L, 0)).toDF("vec_id", "cell"))
    AnnIndexStore.saveIvf(spark, dir, cents.take(1),
      Seq((2L, 0), (3L, 0)).toDF("vec_id", "cell"))
    assert(AnnIndexStore.loadManifest(dir).k == 1)
    assert(AnnIndexStore.loadMembers(spark, dir).count() == 2)
  }

  test("a fresh session (no caches, nothing trained) serves from the store") {
    import spark.implicits._
    val dir = graft.util.Scratch.dir("annstore-spec")
    val members = Seq((10L, 0), (11L, 1)).toDF("vec_id", "cell")
    AnnIndexStore.saveIvf(spark, dir, cents, members)
    val fresh = spark.newSession()
    // the fresh session has its own catalog/conf/cache keyspace; the
    // load path must not depend on anything the saving session cached
    val m = AnnIndexStore.loadMembers(fresh, dir)
    assert(m.sparkSession eq fresh)
    assert(m.count() == 2)
    assert(AnnIndexStore.loadCentroids(fresh, dir).map(_.cell) == Seq(0, 1))
  }
}
