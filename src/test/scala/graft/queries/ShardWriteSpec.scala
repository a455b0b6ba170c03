package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** q123_sharded_write: the physical training-shard writer. Beyond the
  * DuckDB oracle (shared with q72 — the manifest is a pure function of
  * the salted-md5 assignment):
  *  - the read-back manifest must equal q72's relation-side manifest
  *    row-for-row (write path loses/duplicates/re-shards nothing);
  *  - the written layout is what a data loader wants: 16 `shard=N`
  *    partition dirs, exactly ONE data file each (the shuffle is keyed
  *    on the shard), rows id-sorted within each file.
  */
class ShardWriteSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("q123 read-back manifest equals q72's relation-side manifest") {
    val fromFiles = SparkEntry.queries("q123_sharded_write")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val fromRelation = SparkEntry.queries("q72_shard_manifest")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(fromFiles == fromRelation)
  }

  test("q123 writes one id-sorted file per shard dir") {
    val out = java.nio.file.Files.createTempDirectory("q123-layout").toString
    Pipeline.shardedWriteManifest(spark, dir, out).collect() // force the write
    val root = new java.io.File(out)
    val shardDirs = root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length == 16, s"expected 16 shard dirs, got ${shardDirs.length}")
    shardDirs.foreach { sd =>
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${sd.getName} has ${files.length} data files, want 1")
      val ids = spark.read.parquet(files.head.getAbsolutePath)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"${sd.getName} not id-sorted")
      assert(ids.nonEmpty)
    }
  }
}
