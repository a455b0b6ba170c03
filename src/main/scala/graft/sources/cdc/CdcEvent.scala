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
        case "domain" =>
          // fast path first: the hand scanner accepts only the plain
          // wire shape and returns null on ANYTHING unexpected, so the
          // Jackson streaming decode below stays the semantics anchor
          // (differential property tests pin fast == jackson on every
          // accepted event)
          val fast = decodeDmlFast(json)
          if (fast != null) Right(fast) else decodeDml(json)
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

  /** Hand-rolled DML envelope scan — the wire-rate fast path in front
    * of [[decodeDml]]. At ~1M events/s the Jackson streaming parse is
    * the measured ceiling (parser object + token dispatch per ~130-byte
    * event); this scanner reads the six envelope fields in one
    * branch-light pass and SKIPS payload values structurally (strings
    * with validated escapes, strict-grammar numbers, literals).
    *
    * Deliberately CONSERVATIVE: it accepts only the plain shape the
    * avro router emits — top-level `"name":value` members, envelope
    * values as unquoted integer tokens, `event_type` as an escape-free
    * string — and returns null (→ Jackson path) for anything else:
    * escapes in a field name, a non-integer envelope value, malformed
    * syntax, truncation. It never *rejects* an event itself, so
    * malformed-input semantics (`Left(malformed ...)` with Jackson's
    * message) are byte-identical to the slow path. CdcEventFastSpec
    * pins fast == jackson differentially on random valid and mutated
    * events.
    */
  private[cdc] def decodeDmlFast(json: String): DmlEvent = {
    val n = json.length
    var i = 0
    var domain = 0
    var serverId = 0
    var sequence = 0L
    var eventNumber = 0L
    var timestamp = 0L
    var eventKind: String = null

    // strict JSON whitespace only (Character.isWhitespace also admits
    // U+001C..U+001F, which strict JSON rejects between tokens — those
    // must bail to Jackson, not be silently accepted)
    def ws(): Unit = {
      while (i < n && { val c = json.charAt(i)
        c == ' ' || c == '\t' || c == '\n' || c == '\r' }) i += 1
    }
    // every helper returns false to BAIL (→ Jackson), never to reject:
    // the fast path may only accept inputs Jackson would accept with an
    // identical result, so each scan enforces the STRICT JSON grammar
    // of its token and punts anything else
    def skipString(): Boolean = { // after the opening quote
      while (i < n) {
        val c = json.charAt(i)
        if (c == '"') { i += 1; return true }
        else if (c == '\\') {
          i += 1
          if (i >= n) return false
          json.charAt(i) match {
            case '"' | '\\' | '/' | 'b' | 'f' | 'n' | 'r' | 't' => i += 1
            case 'u' =>
              if (i + 4 >= n) return false
              var k = 1
              while (k <= 4) {
                val h = json.charAt(i + k)
                if (!((h >= '0' && h <= '9') || (h >= 'a' && h <= 'f') ||
                  (h >= 'A' && h <= 'F'))) return false
                k += 1
              }
              i += 5
            case _ => return false // invalid escape — Jackson judges it
          }
        }
        else if (c < 0x20) return false // raw control char — Jackson judges it
        else i += 1
      }
      false
    }
    def skipNumber(): Boolean = { // strict JSON number grammar
      if (json.charAt(i) == '-') i += 1
      if (i >= n) return false
      val c0 = json.charAt(i)
      if (c0 == '0') i += 1
      else if (c0 >= '1' && c0 <= '9') {
        while (i < n && { val d = json.charAt(i); d >= '0' && d <= '9' }) i += 1
      } else return false
      if (i < n && json.charAt(i) == '.') {
        i += 1
        val s = i
        while (i < n && { val d = json.charAt(i); d >= '0' && d <= '9' }) i += 1
        if (i == s) return false
      }
      if (i < n && { val d = json.charAt(i); d == 'e' || d == 'E' }) {
        i += 1
        if (i < n && { val d = json.charAt(i); d == '+' || d == '-' }) i += 1
        val s = i
        while (i < n && { val d = json.charAt(i); d >= '0' && d <= '9' }) i += 1
        if (i == s) return false
      }
      true
    }
    def skipValue(): Boolean = {
      val c = json.charAt(i)
      if (c == '"') { i += 1; skipString() }
      else if (c == 't') { if (json.startsWith("true", i)) { i += 4; true } else false }
      else if (c == 'f') { if (json.startsWith("false", i)) { i += 5; true } else false }
      else if (c == 'n') { if (json.startsWith("null", i)) { i += 4; true } else false }
      else if (c == '-' || (c >= '0' && c <= '9')) skipNumber()
      // nested object/array payload values are not the avro router's
      // flat-row shape — bail rather than hand-validate full JSON
      else false
    }

    ws()
    if (i >= n || json.charAt(i) != '{') return null
    i += 1
    ws()
    var done = i < n && json.charAt(i) == '}' // {} — empty envelope
    if (done) i += 1
    while (!done) {
      // member name (escape-free fast form only; raw control chars
      // bail — strict JSON forbids them in strings, Jackson judges)
      ws()
      if (i >= n || json.charAt(i) != '"') return null
      i += 1
      val nameStart = i
      while (i < n && { val c = json.charAt(i)
        c != '"' && c != '\\' && c >= 0x20 }) i += 1
      if (i >= n || json.charAt(i) != '"') return null
      val nameEnd = i
      i += 1
      ws()
      if (i >= n || json.charAt(i) != ':') return null
      i += 1
      ws()
      if (i >= n) return null
      val slot = envelopeSlot(json, nameStart, nameEnd)
      val c = json.charAt(i)
      if (slot >= 0 && slot < 5) {
        // envelope numerics must be plain non-negative integer tokens
        // (exactly the avro router's wire shape; anything else bails —
        // including leading zeros, which strict JSON forbids)
        if (c < '0' || c > '9') return null
        if (c == '0' && i + 1 < n &&
          { val d = json.charAt(i + 1); d >= '0' && d <= '9' }) return null
        var v = 0L
        val vStart = i
        while (i < n && { val d = json.charAt(i); d >= '0' && d <= '9' }) {
          v = v * 10 + (json.charAt(i) - '0')
          i += 1
        }
        // ≤18 digits fits a Long with no wraparound ambiguity (v*10+d
        // can wrap past negative back to positive on longer runs) —
        // wire sequences are far below; anything bigger bails
        if (i - vStart > 18) return null
        if (i < n && { val d = json.charAt(i); d == '.' || d == 'e' || d == 'E' }) return null
        if ((slot == 0 || slot == 1) && v > Int.MaxValue) return null
        slot match {
          case 0 => domain = v.toInt
          case 1 => serverId = v.toInt
          case 2 => sequence = v
          case 3 => eventNumber = v
          case 4 => timestamp = v
        }
      } else if (slot == 5) {
        // event_type: escape-free string only (control chars bail too)
        if (c != '"') return null
        i += 1
        val s = i
        while (i < n && { val d = json.charAt(i)
          d != '"' && d != '\\' && d >= 0x20 }) i += 1
        if (i >= n || json.charAt(i) != '"') return null
        eventKind = json.substring(s, i)
        i += 1
      } else {
        if (!skipValue()) return null // payload value — skip structurally
      }
      ws()
      if (i >= n) return null
      json.charAt(i) match {
        case ',' => i += 1
        case '}' => i += 1; done = true
        case _ => return null
      }
    }
    ws()
    if (i != n) return null // trailing garbage — let Jackson judge it
    mkDml(domain, serverId, sequence, eventNumber, timestamp, eventKind, json)
  }

  private def mkDml(domain: Int, serverId: Int, sequence: Long,
      eventNumber: Long, timestamp: Long, eventKind: String,
      json: String): DmlEvent =
    DmlEvent(domain, serverId, sequence, eventNumber, timestamp,
      if (eventKind == null) "" else eventKind, json)

  /** Envelope-field dispatch on the name region without substring
    * allocation: 0=domain 1=server_id 2=sequence 3=event_number
    * 4=timestamp 5=event_type, -1=payload. */
  private def envelopeSlot(j: String, s: Int, e: Int): Int = {
    def is(name: String): Boolean = {
      if (e - s != name.length) return false
      var k = 0
      while (k < name.length) { if (j.charAt(s + k) != name.charAt(k)) return false; k += 1 }
      true
    }
    (e - s) match {
      case 6 => if (is("domain")) 0 else -1
      case 9 => if (is("server_id")) 1 else if (is("timestamp")) 4 else -1
      case 8 => if (is("sequence")) 2 else -1
      case 12 => if (is("event_number")) 3 else -1
      case 10 => if (is("event_type")) 5 else -1
      case _ => -1
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
  private[cdc] def decodeDml(json: String): Either[String, CdcEvent] = {
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
