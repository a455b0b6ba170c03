package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the skew doctrine for joins where NEITHER side
  * broadcasts and the key distribution is hot (the third leg next to
  * HotBucketCap for self-join fan-out and AQE skew splitting, which
  * only rescues sort-merge joins AFTER a stage has already straggled).
  *
  * A plain shuffle join sends every row of a hot key to ONE reducer
  * task: with 5 keys over a billion rows, 27 tasks idle while 5 run
  * for hours. Salting splits each fact key into `salts` sub-keys by a
  * deterministic hash of a fact-side identity column, and replicates
  * each dim row once per salt, so the join key becomes (key, salt) and
  * every hot key spreads over `salts` reducers. Replication multiplies
  * the DIM side only — choose salts ~ (hot-key rows / target rows per
  * task), and keep the dim side the SMALL one (cost = |dim| * salts).
  *
  * The salt is pmod(xxhash64(id), salts): deterministic, so results
  * are reproducible run-to-run and the oracle is the PLAIN join SQL —
  * salting may only change movement, never the relation.
  */
object SaltedJoin {

  /** Inner equi-join of `fact` and `dim` on `key`, shuffle-spread over
    * `salts` sub-keys per key. `factId` must be any deterministic
    * fact-side expression (e.g. the row's primary key). */
  def inner(fact: DataFrame, dim: DataFrame, key: String, factId: Column,
      salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(factId), lit(salts.toLong)).cast("int"))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // merge hints on both sides keep the planner from broadcasting the
    // replicated dim at test scale, which would erase the very shuffle
    // the salt exists to spread (at real scale the dim is too big to
    // broadcast -- that is the only reason to salt at all)
    saltedFact.hint("merge").join(repDim.hint("merge"), Seq(key, "__salt"))
      .drop("__salt")
  }
}
