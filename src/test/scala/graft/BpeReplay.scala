package graft

/** Plain-Scala replay of the batched BPE trainer — the third,
  * Spark-free implementation the specs pin the engine against
  * (BpeBigEncodeSpec for the q138 replace-chain loop, BpeWideTrainSpec
  * for the native-retokenize loop, ScaleProbe for the sf1 wide run).
  * Greedy (cnt DESC, pair ASC) window, symbol-disjoint acceptance,
  * per-round single-pass re-tokenize. */
object BpeReplay {

  /** Returns (merge tuples, final per-word tokenization). */
  def train(vocab: Map[String, Long], rounds: Int, batch: Int,
      cap: Int, topC: Int): (Seq[(Int, Int, String, String, Long)], Map[String, Seq[String]]) = {
    def units(w: String): Seq[String] = w.grouped(2).toSeq
    var enc: Map[String, Seq[String]] = vocab.keys.map(w => w -> units(w)).toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val limit = math.min(batch, cap - merges.size)
      if (limit > 0) {
        val pc = scala.collection.mutable.Map.empty[String, Long]
        for ((w, t) <- enc; i <- 0 until t.size - 1) {
          val p = t(i) + " " + t(i + 1)
          pc(p) = pc.getOrElse(p, 0L) + vocab(w)
        }
        val tops = pc.toSeq.sortBy { case (p, c) => (-c, p) }.take(topC)
        val used = scala.collection.mutable.Set.empty[String]
        var rank = 0
        val ps = scala.collection.mutable.Set.empty[(String, String)]
        for ((pair, cnt) <- tops if rank < limit) {
          val Array(a, b) = pair.split(" ", 2)
          if (!used(a) && !used(b) && !used(a + b)) {
            rank += 1
            merges += ((r, rank, pair, a + b, cnt))
            used ++= Seq(a, b, a + b)
            ps += ((a, b))
          }
        }
        if (ps.nonEmpty) enc = enc.map { case (w, t) =>
          val out = scala.collection.mutable.ArrayBuffer(t.head)
          for (x <- t.tail) {
            if (ps((out.last, x))) out(out.size - 1) = out.last + x
            else out += x
          }
          w -> out.toSeq
        }
      }
    }
    (merges.toSeq, enc)
  }
}
