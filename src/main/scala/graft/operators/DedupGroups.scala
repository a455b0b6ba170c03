package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair graph → dedup groups with
  * a canonical representative (the minimum doc id) — the step AFTER
  * pair verification in a corpus dedup pipeline: near-dup pairs chain
  * (A≈B, B≈C), so deduplication must drop whole components, keeping one
  * representative per group, not one per pair.
  *
  * Algorithm: iterative min-label propagation. Every doc starts
  * labelled with itself; each round a doc takes the minimum label over
  * itself and its neighbors; converged when no label changed. Rounds =
  * component diameter — near-dup groups are quasi-cliques, so 2–4
  * rounds in practice — and each round is one equi-join + groupBy
  * shuffle on the doc id. The driver sees only a one-row convergence
  * count per round, never data rows. At extreme component sizes swap
  * in large-star/small-star (alternating min-propagation that halves
  * tree depth per round); the per-round join shape is identical.
  */
object DedupGroups {

  /** @param pairs undirected edges, columns (doc_a, doc_b).
    * @return (doc_id, rep) for every doc appearing in at least one
    *         pair; `rep` = min doc id of its component. */
  def components(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // localCheckpoint (eager) after every round: iterative self-joins
    // otherwise embed the previous round's plan twice per iteration —
    // exponential logical-plan growth that kills the driver long before
    // the data does. With truncation each round's plan is one
    // join+groupBy over materialized blocks.
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("rep", col("doc_id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val contrib = edges
        .join(labels.select(col("doc_id").as("src"), col("rep")), "src")
        .select(col("dst").as("doc_id"), col("rep"))
        .unionByName(labels)
      val next = contrib.groupBy(col("doc_id")).agg(min(col("rep")).as("rep"))
        .localCheckpoint(true)
      val changed = next.as("n")
        .join(labels.as("o"), "doc_id")
        .where(col("n.rep") =!= col("o.rep"))
        .limit(1).count()
      labels = next
      converged = changed == 0L
      i += 1
    }
    labels
  }
}
