package graft.sources.cdc

import org.apache.avro.Schema
import org.apache.avro.generic.GenericRecord

import scala.jdk.CollectionConverters._

/** Avro ↔ CDC-event bridging for the TYPE=AVRO wire mode: the container
  * stream's writer schema maps onto the same [[DdlEvent]]/[[DmlEvent]]
  * model the JSON mode produces, so every downstream consumer
  * (SchemaRegistry, CdcProjection, the DSv2 source) is wire-format
  * agnostic. Envelope columns mirror the JSON DML envelope
  * (`types.go:172-191`): domain, server_id, sequence, event_number,
  * timestamp, event_type; everything else is table data.
  */
object CdcAvro {

  val EnvelopeFields: Set[String] =
    Set("domain", "server_id", "sequence", "event_number", "timestamp", "event_type")

  /** Synthesize the DDL (schema) event from the container's writer
    * schema — the Avro mode's analog of the JSON stream's leading
    * `{"namespace":...}` event. */
  def schemaToDdl(schema: Schema, database: String, table: String): DdlEvent = {
    val fields = schema.getFields.asScala
      .filterNot(f => EnvelopeFields.contains(f.name))
      .map { f =>
        val (avroType, nullable, symbols) = decodeType(f.schema)
        DdlField(f.name, avroType, nullable, symbols,
          realType = Option(f.getProp("real_type")),
          length = Option(f.getProp("length")).map(_.toInt),
          unsigned = Option(f.getProp("unsigned")).map(_.toBoolean))
      }.toSeq
    DdlEvent(
      namespace = Option(schema.getNamespace).getOrElse(""),
      kind = "record",
      name = schema.getName,
      table = table,
      database = database,
      version = Option(schema.getProp("schema_version")).map(_.toInt).getOrElse(1),
      gtid = "",
      fields = fields,
      rawJson = schema.toString)
  }

  private def decodeType(s: Schema): (String, Boolean, Seq[String]) = s.getType match {
    case Schema.Type.UNION =>
      val members = s.getTypes.asScala
      val nullable = members.exists(_.getType == Schema.Type.NULL)
      val value = members.filterNot(_.getType == Schema.Type.NULL)
        .lastOption.getOrElse(s)
      val (t, _, sym) = decodeType(value)
      (t, nullable, sym)
    case Schema.Type.ENUM => ("enum", false, s.getEnumSymbols.asScala.toSeq)
    case t => (t.getName, false, Nil)
  }

  /** One Avro record → the same DmlEvent the JSON decode produces.
    * `rawJson` uses Avro's generic-record JSON rendering (valid JSON for
    * the flat record shapes the CDC router emits), so lazy column
    * projection downstream is identical in both modes. */
  def recordToDml(r: GenericRecord): Either[String, CdcEvent] =
    try {
      def long(name: String): Long = r.get(name) match {
        case null => 0L
        case n: java.lang.Number => n.longValue()
        case other => other.toString.toLong
      }
      Right(DmlEvent(
        domain = long("domain").toInt,
        serverId = long("server_id").toInt,
        sequence = long("sequence"),
        eventNumber = long("event_number"),
        timestamp = long("timestamp"),
        eventKind = String.valueOf(r.get("event_type")),
        rawJson = r.toString))
    } catch {
      case e: Exception => Left(s"malformed avro record: ${e.getMessage}")
    }
}
