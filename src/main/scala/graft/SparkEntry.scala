package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Behavioral, CdcComposed, LlmText, Multimodal, Pipeline, Relational, SemiStructured, SuffixArray, Vectors, Windowed}
import graft.operators.AsOfJoin

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's query + DuckDB oracle from the
  * per-category modules under `graft.queries` / `graft.operators`.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    Relational.defs ++ SemiStructured.defs ++ Windowed.defs ++
      AsOfJoin.defs ++ Vectors.defs ++ LlmText.defs ++ SuffixArray.defs ++
      Multimodal.defs ++ Pipeline.defs ++
      Behavioral.defs ++ CdcComposed.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q5-shaped five-way join + aggregation (SURVEY.md Q06). */
  def entry(spark: SparkSession): DataFrame =
    Relational.defs.find(_.name == "q06_join_multiway").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
