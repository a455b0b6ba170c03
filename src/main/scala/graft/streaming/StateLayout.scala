package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType}

/** Bucketed physical layout for the incremental states' parquet dirs
  * (VERDICT r10 item 2).
  *
  * Every incremental state (IncrementalLineDedup, IncrementalDupSpans,
  * IncrementalSubstringRemoval, IncrementalReportCard, IncrementalIvf,
  * IncrementalNearDup, the qc4 feed) runs a per-batch replay-guard
  * anti-join — "drop batch rows whose key is already committed" — and
  * some run heavier probes (the near-dup candidate stage). With a flat
  * state dir every such probe SCANS the whole committed state every
  * micro-batch: file IO that grows with the corpus, not the batch. This
  * helper writes state through `partitionBy` on a stable hash bucket of
  * the probe key, so a per-batch probe reads only the partitions its
  * batch keys can possibly live in — `PartitionFilters` at the file
  * source, O(touched buckets) IO — the repo's q100b/q102 partition-
  * pruning machinery applied to its own state stores.
  *
  * Soundness of pruned reads: the bucket is a pure function of the key
  * ([[bucketOf]] — Murmur3 `hash` mod [[NumBuckets]]), so any committed
  * row that could equi-join (or anti-join) a batch key lives in that
  * key's bucket; restricting the scan to the batch's bucket set cannot
  * change the join result. The bucket column is physical layout only —
  * [[read]]/[[readPruned]] return exactly the logical schema, so
  * results (and oracle hashes) are unchanged.
  *
  * Bucket count: 16 balances pruning (a 1-doc batch reads ≤ 1/16 of
  * state files… plus the layout survives 1000× growth because buckets
  * are split by compaction parts, not file count) against small-file
  * pressure (each append creates ≤ 16 dirs × its task files; the
  * periodic [[IncrementalLineDedup.compact]]-style rewrite bounds the
  * accumulation — standard streaming-state hygiene either way).
  */
object StateLayout {

  val NumBuckets = 16
  val BucketCol = "sb"

  /** Stable bucket of `keys` — pure function of the key columns, same
    * on the write and probe side. */
  def bucketOf(keys: Seq[String]): Column =
    pmod(hash(keys.map(col): _*), lit(NumBuckets))

  /** Append `df` under `dir`, physically partitioned by the key bucket. */
  def append(df: DataFrame, dir: String, keys: Seq[String]): Unit =
    df.withColumn(BucketCol, bucketOf(keys))
      .write.mode("append").partitionBy(BucketCol).parquet(dir)

  /** Compaction rewrite preserving the bucketed layout: `repartition`
    * ON the bucket column puts each bucket's rows in exactly one task,
    * so the rewritten dir holds one file per non-empty bucket — ≤
    * [[NumBuckets]] files total, however many micro-batch appends (each
    * up to [[NumBuckets]] small files) accumulated before the rewrite.
    * The caller's `parts` knob is superseded by this bound: per-bucket
    * sub-splitting would only matter once a single bucket outgrows one
    * task's write, at which point raising [[NumBuckets]] is the right
    * lever (it also sharpens pruning). */
  def overwriteCompacted(df: DataFrame, dir: String, keys: Seq[String],
      parts: Int): Unit =
    df.withColumn(BucketCol, bucketOf(keys))
      .repartition(NumBuckets, col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(dir)

  private def schemaWithBucket(schema: StructType): StructType =
    schema.add(BucketCol, IntegerType)

  private def logicalCols(schema: StructType): Seq[Column] =
    schema.fields.toSeq.map(f => col(f.name))

  private def emptyOf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Full state read (emission paths — inherently O(state)); empty
    * relation when the dir does not exist yet. `schema` is the LOGICAL
    * schema, without the bucket column. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    if (!exists(spark, dir)) emptyOf(spark, schema)
    else spark.read.schema(schemaWithBucket(schema)).parquet(dir)
      .select(logicalCols(schema): _*)

  /** Pruned state read for per-batch probes: only the partitions whose
    * bucket appears among `probe`'s `probeKeys` buckets are scanned
    * (`PartitionFilters` at the file source). `probe` must be bounded
    * and cheap to evaluate (the states checkpoint their batch first) —
    * its distinct bucket set (≤ [[NumBuckets]] ints) is collected on
    * the driver to drive the partition filter. Returns the logical
    * schema; see the class doc for why restricting to these partitions
    * is join/anti-join exact. */
  def readPruned(spark: SparkSession, dir: String, schema: StructType,
      probe: DataFrame, probeKeys: Seq[String]): DataFrame =
    if (!exists(spark, dir)) emptyOf(spark, schema)
    else {
      val buckets = probe
        .select(pmod(hash(probeKeys.map(probe(_)): _*), lit(NumBuckets))
          .as(BucketCol))
        .distinct().collect().map(_.getInt(0)).toSeq
      spark.read.schema(schemaWithBucket(schema)).parquet(dir)
        .where(col(BucketCol).isin(buckets: _*))
        .select(logicalCols(schema): _*)
    }
}
