package graft.sources.cdc

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Typed model of the MaxScale CDC event stream (reference:
  * `types.go:11-191`): exactly two event kinds, discriminated by their
  * leading field — `{"namespace":...}` = DDL (schema), `{"domain":...}`
  * = DML (row). Decoding uses Jackson (already on Spark's classpath).
  */
sealed trait CdcEvent { def eventType: String }

/** Avro-router schema event (`types.go:30-48`). */
final case class DdlEvent(
    namespace: String,
    kind: String, // "type" in the wire format, e.g. "record"
    name: String,
    table: String,
    database: String,
    version: Int,
    gtid: String,
    fields: Seq[DdlField],
    rawJson: String) extends CdcEvent {
  def eventType: String = "ddlEvent"
}

/** One column of a DDL event. `avroType` is the decoded Avro logical
  * type; `nullable` reflects a `["null", T]` union; `enumSymbols` is set
  * for enum-typed columns (the reference *builds* the enum value but
  * never stores it — `types.go:105-113` — we implement the intended
  * semantics); `realType`/`length`/`unsigned` carry the original MySQL
  * type info when present.
  */
final case class DdlField(
    name: String,
    avroType: String,
    nullable: Boolean,
    enumSymbols: Seq[String],
    realType: Option[String],
    length: Option[Int],
    unsigned: Option[Boolean])

/** Row event (`types.go:172-191`): fixed metadata envelope + the raw
  * JSON object (column values stay lazily-decoded, as in the reference's
  * `RawData`). `eventKind` ∈ insert | update_before | update_after |
  * delete. */
final case class DmlEvent(
    domain: Int,
    serverId: Int,
    sequence: Long,
    eventNumber: Long,
    timestamp: Long,
    eventKind: String,
    rawJson: String) extends CdcEvent {
  def eventType: String = "dmlEvent"
}

object CdcEvent {
  private val mapper = new ObjectMapper

  /** Cheap prefix dispatch before a full parse (reference:
    * `stream.go:13-16`, `stream.go:119-135`): `{ "namespace"` = DDL,
    * `{ "domain"` = DML, whitespace-tolerant. Hand scan — this runs
    * once per wire event, and the regex form it replaces showed up in
    * the single-connection ingest profile. */
  private def prefixKey(json: String): String = {
    var i = 0
    val n = json.length
    while (i < n && json.charAt(i).isWhitespace) i += 1
    if (i >= n || json.charAt(i) != '{') return ""
    i += 1
    while (i < n && json.charAt(i).isWhitespace) i += 1
    if (i >= n || json.charAt(i) != '"') return ""
    i += 1
    val start = i
    while (i < n && json.charAt(i) != '"') i += 1
    json.substring(start, i)
  }

  def decode(json: String): Either[String, CdcEvent] =
    try {
      prefixKey(json) match {
        case "namespace" => decodeDdl(json)
        case "domain" => decodeDml(json)
        case _ => Left(s"unknown event shape: ${json.take(60)}")
      }
    } catch {
      case e: Exception => Left(s"malformed event: ${e.getMessage}")
    }

  private def decodeDdl(json: String): Either[String, CdcEvent] = {
    val n = mapper.readTree(json)
    val fields = n.path("fields").elements().asScala.map(decodeField).toSeq
    fields.collectFirst { case Left(err) => err } match {
      case Some(err) => Left(err)
      case None => Right(DdlEvent(
        namespace = n.path("namespace").asText(),
        kind = n.path("type").asText(),
        name = n.path("name").asText(),
        table = n.path("table").asText(),
        database = n.path("database").asText(),
        version = n.path("version").asInt(),
        gtid = n.path("gtid").asText(),
        fields = fields.collect { case Right(f) => f },
        rawJson = json))
    }
  }

  /** The three Avro field-type shapes (`types.go:68-117`): plain string,
    * `["null", T]` union (nullable, last member wins), enum object. */
  private def decodeField(f: JsonNode): Either[String, DdlField] = {
    val name = f.path("name").asText()
    val realType = Option(f.get("real_type")).filter(!_.isNull).map(_.asText())
    val length = Option(f.get("length")).filter(_.isNumber).map(_.asInt())
    val unsigned = Option(f.get("unsigned")).filter(_.isBoolean).map(_.asBoolean())
    val t = f.path("type")
    if (t.isTextual) {
      Right(DdlField(name, t.asText(), nullable = false, Nil, realType, length, unsigned))
    } else if (t.isArray) {
      val members = t.elements().asScala.map(_.asText()).toSeq
      val nullable = members.contains("null")
      val vt = members.lastOption.getOrElse("string")
      Right(DdlField(name, vt, nullable, Nil, realType, length, unsigned))
    } else if (t.isObject && t.path("type").asText() == "enum") {
      val symbols = t.path("symbols").elements().asScala.map(_.asText()).toSeq
      Right(DdlField(name, "enum", nullable = false, symbols, realType, length, unsigned))
    } else {
      Left(s"unsupported complex field type for '$name': $t")
    }
  }

  /** DML decode via the STREAMING parser: one pass that collects the
    * six envelope fields and `skipChildren()`s everything else — no
    * JsonNode tree is built for the payload columns (they stay lazy in
    * `rawJson`, the reference's `RawData` contract), which is the
    * measured hot cost of `readTree` at wire rate. Malformed-input
    * semantics are unchanged: the parser consumes the WHOLE object to
    * END_OBJECT, so a syntax error anywhere — envelope or payload —
    * still throws and surfaces as `Left(malformed ...)`. */
  private def decodeDml(json: String): Either[String, CdcEvent] = {
    val p = mapper.createParser(json)
    try {
      var domain = 0
      var serverId = 0
      var sequence = 0L
      var eventNumber = 0L
      var timestamp = 0L
      var eventKind: String = null
      if (p.nextToken() != com.fasterxml.jackson.core.JsonToken.START_OBJECT)
        throw new IllegalArgumentException("not a JSON object")
      var t = p.nextToken()
      while (t == com.fasterxml.jackson.core.JsonToken.FIELD_NAME) {
        val name = p.currentName()
        p.nextToken() // move onto the value
        name match {
          case "domain" => domain = p.getValueAsInt
          case "server_id" => serverId = p.getValueAsInt
          case "sequence" => sequence = p.getValueAsLong
          case "event_number" => eventNumber = p.getValueAsLong
          case "timestamp" => timestamp = p.getValueAsLong
          case "event_type" => eventKind = p.getValueAsString
          case _ => p.skipChildren() // payload column — stays lazy
        }
        t = p.nextToken()
      }
      if (t != com.fasterxml.jackson.core.JsonToken.END_OBJECT)
        throw new IllegalArgumentException(s"unexpected token $t")
      Right(DmlEvent(domain, serverId, sequence, eventNumber, timestamp,
        if (eventKind == null) "" else eventKind, json))
    } finally p.close()
  }
}
