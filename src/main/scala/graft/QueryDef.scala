package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a Spark query over the fixture tables plus an
  * optional DuckDB-equivalent oracle SQL following the normalization
  * protocol of SURVEY.md §2C (aliases identical on both sides, doubles
  * rounded, timestamps rendered as strings, total ORDER BY ending in a
  * unique key).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
