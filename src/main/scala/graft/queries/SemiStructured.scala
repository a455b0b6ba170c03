package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Arrays, JSON-in-string, and timestamp/interval arithmetic
  * (SURVEY.md §2C Q33–Q36).
  *
  * Embedding elements are cast FLOAT→DOUBLE before any arithmetic: DuckDB
  * list functions on FLOAT[] stay in float32 and would never hash-match
  * double-precision Spark results (SURVEY.md §7.3).
  */
object SemiStructured {

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q33_array_stats",
      (s, d) => Tables(s, d, "embeddings").agg(
        count(lit(1)).as("cnt"),
        min(size(col("embedding"))).as("min_dim"),
        max(size(col("embedding"))).as("max_dim")),
      Some("SELECT COUNT(*) AS cnt, CAST(MIN(len(embedding)) AS INT) AS min_dim, " +
        "CAST(MAX(len(embedding)) AS INT) AS max_dim FROM embeddings")),

    QueryDef("q33b_array_elem",
      (s, d) => Tables(s, d, "embeddings")
        .where(col("vec_id") <= 5)
        .select(col("vec_id"), size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 4).as("first_elem"))
        .orderBy(col("vec_id")),
      Some("SELECT vec_id, CAST(len(embedding) AS INT) AS dim, " +
        "ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_elem " +
        "FROM embeddings WHERE vec_id <= 5 ORDER BY vec_id")),

    QueryDef("q34_vector_norm",
      // posexplode + hash-agg: at scale the per-vector norm is a map-side
      // combine over array elements — no cross-row shuffle beyond vec_id.
      (s, d) => Tables(s, d, "embeddings")
        .where(col("vec_id") <= 50)
        .select(col("vec_id"), explode(col("embedding")).as("x"))
        .select(col("vec_id"), col("x").cast("double").as("x"))
        .groupBy(col("vec_id"))
        .agg(round(sqrt(sum(col("x") * col("x"))), 4).as("norm"))
        .orderBy(col("vec_id")),
      Some("SELECT vec_id, ROUND(SQRT(SUM(x*x)), 4) AS norm FROM (" +
        "SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x FROM embeddings WHERE vec_id <= 50" +
        ") GROUP BY vec_id ORDER BY vec_id")),

    QueryDef("q35_json_extract",
      (s, d) => Tables(s, d, "events")
        .groupBy(col("event_type"))
        .agg(round(avg(get_json_object(col("props"), "$.k").cast("int")), 2).as("avg_k"))
        .orderBy(col("event_type")),
      Some("SELECT event_type, ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 2) AS avg_k " +
        "FROM events GROUP BY event_type ORDER BY event_type")),

    QueryDef("q35b_map_funcs",
      // MapType surface: JSON payload as map<string,int>, map_keys /
      // element_at / size over it
      (s, d) => Tables(s, d, "events")
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.IntegerType)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          round(avg(size(col("m"))), 2).as("avg_nkeys"),
          min(concat_ws(",", map_keys(col("m")))).as("min_keys"),
          round(avg(element_at(col("m"), "k")), 2).as("avg_k"))
        .orderBy(col("event_type")),
      Some("SELECT event_type, COUNT(*) AS cnt, " +
        "ROUND(AVG(len(json_keys(props))), 2) AS avg_nkeys, " +
        "MIN(array_to_string(json_keys(props), ',')) AS min_keys, " +
        "ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 2) AS avg_k " +
        "FROM events GROUP BY event_type ORDER BY event_type")),

    QueryDef("q43b_array_ops",
      // array set operations: distinct / sort / slice / join
      (s, d) => Tables(s, d, "documents")
        .withColumn("t", split(col("text"), " "))
        .select(col("doc_id"), size(array_distinct(col("t"))).as("n_uniq"),
          concat_ws(" ", slice(sort_array(array_distinct(col("t"))), 1, 3)).as("first3"))
        .orderBy(col("doc_id")),
      Some("SELECT doc_id, CAST(len(list_distinct(t)) AS INT) AS n_uniq, " +
        "array_to_string(list_sort(list_distinct(t))[1:3], ' ') AS first3 " +
        "FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) " +
        "ORDER BY doc_id")),

    QueryDef("q36_datediff",
      (s, d) => Tables(s, d, "lineitem")
        .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(round(avg(datediff(col("l_shipdate"), col("o_orderdate"))), 2).as("avg_days"))
        .orderBy(col("l_returnflag")),
      Some("SELECT l_returnflag, ROUND(AVG(date_diff('day', o_orderdate, l_shipdate)), 2) AS avg_days " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY l_returnflag ORDER BY l_returnflag")),

    QueryDef("q36b_interval",
      (s, d) => Tables(s, d, "events")
        .where(col("ts") + expr("INTERVAL 1 DAY") > lit("2024-01-10 00:00:00").cast("timestamp"))
        .agg(count(lit(1)).as("cnt")),
      Some("SELECT COUNT(*) AS cnt FROM events " +
        "WHERE ts + INTERVAL 1 DAY > TIMESTAMP '2024-01-10 00:00:00'")))
}
