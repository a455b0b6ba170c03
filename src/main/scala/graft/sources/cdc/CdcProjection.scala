package graft.sources.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
