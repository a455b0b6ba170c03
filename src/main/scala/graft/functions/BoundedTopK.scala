package graft.functions

/** The ONE bounded sorted-insert both top-k consumers share.
  *
  * [[TopKRows]] (the batch Aggregator) and
  * [[graft.streaming.SourceCap]] (q98's streaming state machine) keep
  * the same invariant — a ≤ k buffer sorted by a total order
  * (score DESC, then id keys ASC) with order-independent insertion —
  * and previously each carried its own copy of the insert (flagged in
  * STATE.md as accepted duplication: the streaming twin's spec pins
  * stream==batch bit-for-bit, so the two orderings must never
  * de-sync). Extracting the insert makes that impossible by
  * construction: there is now exactly one place the fast-reject +
  * span-insert lives, parameterized only by the element order.
  *
  * `insert` is O(k) per element (k tiny everywhere it's used);
  * associativity/commutativity of the fold it induces — the property
  * the Aggregator's merge and the state machine's arrival-order
  * independence both rest on — follows from `lt` being a TOTAL order:
  * the buffer is always exactly the k least elements under `lt`,
  * whatever the arrival order.
  */
private[graft] object BoundedTopK {

  /** Insert `a` into the `lt`-sorted ≤ `k` buffer `items`, dropping
    * below the floor. Fast-rejects when the buffer is full and `a`
    * ranks at-or-below the current last element. */
  def insert[A](items: Vector[A], a: A, k: Int)(lt: (A, A) => Boolean): Vector[A] =
    if (items.size >= k && !lt(a, items.last)) items
    else {
      val (hi, lo) = items.span(lt(_, a))
      ((hi :+ a) ++ lo).take(k)
    }

  /** O(x+y log) merge of two sorted buffers back to ≤ `k`. */
  def merge[A](x: Seq[A], y: Seq[A], k: Int)(lt: (A, A) => Boolean): Seq[A] =
    (x ++ y).sortWith(lt).take(k)
}
