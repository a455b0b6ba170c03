package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query runs at the sf0.001 tier and the
  * driver-contract maps stay consistent. Value-level correctness is the
  * DuckDB oracle gate (tools/check.py), not this spec. */
class BatchQueriesSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("query names are unique and every oracle key has a query") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.length == names.length)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.allDefs) {
    test(s"${q.name} executes at sf0.001") {
      q.run(spark, dir).collect() // materialize fully, not just count
    }
  }
}
