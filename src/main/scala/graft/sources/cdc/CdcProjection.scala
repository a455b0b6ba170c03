package graft.sources.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Payload projection for maxscale-cdc streams: turns the raw-JSON
  * `payload` column into typed columns via the schema registry — the
  * Spark analog of the reference's user-side `RawData` unmarshal
  * (`types.go:182-190`), done lazily so only referenced fields are
  * parsed (Catalyst prunes `from_json`).
  */
object CdcProjection {

  val envelopeCols: Seq[String] =
    Seq("op", "domain", "server_id", "sequence", "event_number", "ts", "schema_version")

  /** Absorb the DDL rows of a (micro-)batch into `into` — DDL rows carry
    * the full original schema JSON in `payload`. The collect is
    * driver-side but bounded by the number of schema *changes* in the
    * batch, not data volume. Pass the same registry on every batch: a
    * batch with no DDL rows must keep projecting with the last schema.
    */
  def registryFrom(df: DataFrame,
      into: SchemaRegistry = new SchemaRegistry): SchemaRegistry = {
    df.where(col("kind") === "ddl").select(col("payload")).collect()
      .foreach(r => CdcEvent.decode(r.getString(0)) match {
        case Right(d: DdlEvent) => into.register(d)
        case _ => ()
      })
    into
  }

  /** Project DML rows through the latest registered schema. Rows written
    * under an older schema version get NULL for later-added columns
    * (`from_json` is permissive about missing fields) — the standard CDC
    * wide-schema materialization. Per-version processing remains
    * possible via the `schema_version` column stamped at ingest. */
  def projectLatest(df: DataFrame, registry: SchemaRegistry,
      database: String, table: String): DataFrame = {
    val schema = registry.latest(database, table).getOrElse(
      throw new IllegalStateException(s"no schema registered for $database.$table"))
    df.where(col("kind") === "dml")
      .withColumn("_row", from_json(col("payload"), schema))
      .select(envelopeCols.map(col) :+ col("_row.*"): _*)
  }

  /** Project each DML row under the schema version STAMPED ON IT at
    * ingest (SURVEY.md §7.3 in-band evolution): one micro-batch may span
    * a DDL boundary, and [[projectLatest]] force-fits old rows to the
    * newest schema — fine for additive evolution, lossy for renames or
    * retypes. Here v1 rows parse with v1's schema. Output columns are
    * the union of every registered version's fields (first-registered
    * order); fields absent from a row's version are null. Rows with a
    * null or unregistered stamp fall back to the latest schema. The
    * per-version fan-out is driver-side only in plan count (one
    * `from_json` branch per registered version — bounded by schema
    * changes, not data volume); each branch is a plain map over its
    * slice of the batch. */
  def projectPerVersion(df: DataFrame, registry: SchemaRegistry,
      database: String, table: String): DataFrame = {
    val versions = registry.versions(database, table)
    require(versions.nonEmpty, s"no schema registered for $database.$table")
    val schemas = versions.map(v => v -> registry.get(database, table, v).get)
    val wide: Seq[StructField] = schemas.flatMap(_._2.fields)
      .foldLeft(Vector.empty[StructField]) { (acc, f) =>
        if (acc.exists(_.name == f.name)) acc else acc :+ f
      }
    val latestV = versions.max
    def branch(schema: StructType, pred: Column): DataFrame =
      df.where(col("kind") === "dml" && pred)
        .withColumn("_row", from_json(col("payload"), schema))
        .select(envelopeCols.map(col) ++ wide.map { f =>
          if (schema.fieldNames.contains(f.name)) col("_row").getField(f.name).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }: _*)
    schemas.map { case (v, sc) =>
      val pred =
        if (v == latestV)
          col("schema_version") === v || col("schema_version").isNull ||
            !col("schema_version").isin(versions.map(Int.box): _*)
        else col("schema_version") === v
      branch(sc, pred)
    }.reduce(_ unionByName _)
  }
}
