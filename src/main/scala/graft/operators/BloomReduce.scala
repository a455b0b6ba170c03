package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Explicit Bloom-filter semi-join reduction — the runtime row-level
  * filtering pattern (Spark's `InjectRuntimeFilter`, here made
  * deterministic and always-on): train a Bloom filter over the build
  * side's join keys in ONE distributed aggregate, bring back ONE binary
  * row (bounded driver action, the centroids-as-literals doctrine),
  * and embed it as a literal probe filter on the fact scan BEFORE the
  * join. At 100 TB the probe side drops non-qualifying rows at the
  * scan — before the shuffle — for the cost of a ~hundred-KB broadcast
  * constant; false positives only cost work (the exact equi-join still
  * runs), never correctness, and the bit-OR merge makes the trained
  * filter independent of row order and partitioning.
  *
  * Keys are xxhash64-folded on BOTH sides (the same pairing Spark's
  * own injected filters use), so any key type reduces to the LONG the
  * Bloom inserts and probes.
  */
object BloomReduce {

  /** Train a Bloom filter over `key` of `df`; returns the serialized
    * filter (V1 sketch format). */
  def bloomOf(df: DataFrame, key: Column, expectedItems: Long = 100000L): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key)), expectedItems).toAggregateExpression()
    df.agg(ColumnBridge.column(agg).as("bf")).collect()(0).getAs[Array[Byte]](0)
  }

  /** Probe predicate: might `key` be in the trained filter? */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), ColumnBridge.expression(xxhash64(key))))
}
