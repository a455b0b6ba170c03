package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** q98's per-source contribution cap as a STREAMING state machine:
  * maintain each source's running top-k (score DESC, doc_id ASC) over
  * an unbounded document stream. State per source is the same bounded
  * ≤ k sorted buffer as `functions/TopKRows` — held incrementally in
  * the state store instead of folded per task, so the cap is available
  * mid-stream (a crawler can enforce "this domain is full" while still
  * ingesting). Insertion is order-independent (same total order, same
  * tie-breaks), so after ANY arrival order drains, the final buffers
  * must equal the batch q98 — pinned by SourceCapSpec over shuffled
  * multi-wave arrival. State is k entries × live sources, watermark-
  * free (a corpus-wide cap never expires) — bytes, not documents.
  */
object SourceCap {

  final case class ScoredDoc(source: String, doc_id: Long, score: Double)
  final case class CapState(items: Seq[(Double, Long)])
  final case class CapOut(source: String, items: Seq[(Double, Long)])

  /** Expects (source, doc_id, score); emits each touched source's
    * current ≤ k cap per micro-batch (Update mode). */
  def runningCap(scored: DataFrame, k: Int = 5): DataFrame = {
    def lt(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    scored.select(col("source"), col("doc_id"), col("score"))
      .as[ScoredDoc](Encoders.product[ScoredDoc])
      .groupByKey(_.source)(Encoders.STRING)
      .mapGroupsWithState[CapState, CapOut](GroupStateTimeout.NoTimeout())(
        (src: String, it: Iterator[ScoredDoc], state: org.apache.spark.sql.streaming.GroupState[CapState]) => {
          var items = state.getOption.map(_.items.toVector).getOrElse(Vector.empty)
          it.foreach { d =>
            // the SAME insert as TopKRows.reduce — one implementation,
            // so the spec-pinned stream==batch parity can't de-sync
            items = graft.functions.BoundedTopK.insert(items, (d.score, d.doc_id), k)(lt)
          }
          state.update(CapState(items))
          CapOut(src, items)
        })(Encoders.product[CapState], Encoders.product[CapOut])
      .toDF()
  }
}
