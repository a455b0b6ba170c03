package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-safe point-in-interval (pure range) join.
  *
  * A range predicate with no equi component compiles to
  * BroadcastNestedLoopJoin in Spark — an n·m pass that dies at scale.
  * The standard fix is temporal bucketing: each interval explodes into
  * the fixed-width time buckets it overlaps, each point maps to exactly
  * one bucket, candidates share a bucket (a hash equi-join), and exact
  * containment filters the candidates. Cost is linear in points plus
  * total interval/bucket overlap; `bucketSeconds` tunes the tradeoff
  * (≈ the typical interval length: too small explodes intervals into
  * many rows, too large packs unrelated points into shared buckets).
  *
  * Bucketing uses second-truncated epochs on both sides; truncation is
  * monotone, so a contained point always lands within the interval's
  * bucket span — candidate generation has no false negatives, and the
  * exact predicate runs on the full-precision timestamps.
  */
object IntervalJoin {

  /** @param points      rows with timestamp column `tsCol`
    * @param intervals   rows with `startCol`/`endCol` timestamps
    * @param bucketSeconds bucket width
    * @return points ⋈ intervals where start ≤ ts ≤ end, both sides'
    *         columns kept (names must not collide). */
  def pointInInterval(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val p = points.withColumn("__bucket",
      floor(unix_timestamp(col(tsCol)) / bucketSeconds))
    val iv = intervals.withColumn("__bucket", explode(sequence(
      floor(unix_timestamp(col(startCol)) / bucketSeconds),
      floor(unix_timestamp(col(endCol)) / bucketSeconds))))
    p.join(iv, "__bucket")
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
