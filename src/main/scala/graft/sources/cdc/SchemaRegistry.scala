package graft.sources.cdc

import org.apache.spark.sql.types._

import scala.collection.concurrent.TrieMap

/** In-band, versioned schema registry: DDL events arriving on the stream
  * become Spark `StructType`s keyed by (database, table, version)
  * (SURVEY.md §1.2/§1.4; reference `types.go:30-48`).
  *
  * Mapping rules:
  *  - Avro primitive → Spark type; `real_type`/`length`/`unsigned`
  *    refine it (unsigned ints widen one step so values never overflow).
  *  - `["null", T]` union → nullable column.
  *  - enum → StringType carrying the symbol set in column metadata
  *    (`enumValues`), checked by [[graft.functions.EnumCheck]].
  *
  * Thread-safe: the streaming source's receiver thread registers while
  * micro-batch planning reads.
  */
final class SchemaRegistry {

  private val schemas = TrieMap.empty[(String, String, Int), StructType]
  @volatile private var latestVersion = Map.empty[(String, String), Int]

  def register(ddl: DdlEvent): StructType = {
    val st = SchemaRegistry.toStructType(ddl)
    val key = (ddl.database, ddl.table, ddl.version)
    schemas.put(key, st)
    latestVersion = latestVersion.updated((ddl.database, ddl.table),
      math.max(ddl.version, latestVersion.getOrElse((ddl.database, ddl.table), Int.MinValue)))
    st
  }

  def get(database: String, table: String, version: Int): Option[StructType] =
    schemas.get((database, table, version))

  def latest(database: String, table: String): Option[StructType] =
    latestVersion.get((database, table)).flatMap(v => schemas.get((database, table, v)))

  /** All registered versions for a table, ascending. */
  def versions(database: String, table: String): Seq[Int] =
    schemas.keys.collect { case (d, t, v) if d == database && t == table => v }
      .toSeq.sorted
}

object SchemaRegistry {

  def toStructType(ddl: DdlEvent): StructType =
    StructType(ddl.fields.map(toStructField))

  def toStructField(f: DdlField): StructField = {
    val base = f.avroType match {
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "boolean" => BooleanType
      case "bytes" => BinaryType
      case "string" | "enum" => StringType
      case other => StringType // unknown primitives degrade to string
    }
    // real_type refinements: unsigned integers widen one step (the raw
    // type can't represent the full unsigned range); date/time real
    // types arrive as epoch numbers upstream so stay numeric here.
    val refined = (base, f.realType.map(_.toLowerCase), f.unsigned) match {
      case (IntegerType, _, Some(true)) => LongType
      case (LongType, _, Some(true)) => DecimalType(20, 0)
      case (IntegerType, Some("tinyint" | "smallint"), _) => IntegerType
      case (t, _, _) => t
    }
    val meta = {
      val b = new MetadataBuilder()
      f.realType.foreach(rt => b.putString("realType", rt))
      f.length.foreach(l => b.putLong("length", l.toLong))
      if (f.enumSymbols.nonEmpty) b.putStringArray("enumValues", f.enumSymbols.toArray)
      b.build()
    }
    StructField(f.name, refined, nullable = f.nullable, metadata = meta)
  }
}
