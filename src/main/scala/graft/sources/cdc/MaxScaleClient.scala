package graft.sources.cdc

import java.io.{InputStream, OutputStream}
import java.net.{InetSocketAddress, Socket, SocketTimeoutException}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** Blocking client for the MaxScale CDC TCP protocol (reference:
  * `gomaxscale.go:55-113`): connect → authenticate → register →
  * request-data, then a pull loop of framed events.
  *
  * Protocol details mirrored from the reference:
  *  - auth payload is `hex(user ++ ":" ++ sha1_raw(password))`
  *    (`gomaxscale.go:64-81`);
  *  - registration is `REGISTER UUID=<uuid>, TYPE=JSON`
  *    (`gomaxscale.go:87-90`);
  *  - subscription is `REQUEST-DATA db.table[.version] [gtid]`
  *    (`gomaxscale.go:96-107`).
  * Deliberate upgrade: server errors are detected by the documented
  * `ERR` reply prefix, not the reference's substring-"err" sniff that
  * false-positives on data (`stream.go:143-148`, SURVEY.md A8).
  *
  * Extension beyond the reference (which hard-codes TYPE=JSON,
  * `gomaxscale.go:87-90`): `wireType = "AVRO"` registers for the binary
  * Avro wire format — the stream is an Avro Object Container stream,
  * framed by [[AvroFramer]]; each record becomes a [[DmlEvent]] (the
  * envelope columns are the same), and the container's writer schema is
  * surfaced once as a synthetic [[DdlEvent]] so schema-registry-driven
  * consumers work identically in both modes.
  */
final class MaxScaleClient(
    host: String,
    port: Int,
    user: String,
    password: String,
    uuid: String = "XXX-YYY_YYY",
    database: String,
    table: String,
    version: Option[Int] = None,
    gtid: Option[String] = None,
    val connectTimeoutMs: Int = 2000,
    readTimeoutMs: Int = 2000,
    writeTimeoutMs: Int = 2000,
    val bufferSize: Int = 4096,
    val wireType: String = "JSON") {

  require(wireType == "JSON" || wireType == "AVRO", s"unsupported TYPE=$wireType")

  private var socket: Socket = _
  private var in: InputStream = _
  private var out: OutputStream = _
  private val framer = new ByteJsonFramer
  private val avroFramer = new AvroFramer
  private val readBuf = new Array[Byte](bufferSize)

  def connect(): Unit = {
    socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
    socket.setSoTimeout(readTimeoutMs)
    in = socket.getInputStream
    out = socket.getOutputStream

    val sha1 = MessageDigest.getInstance("SHA-1").digest(password.getBytes(UTF_8))
    val authPayload = user.getBytes(UTF_8) ++ ":".getBytes(UTF_8) ++ sha1
    initRequest(authPayload.map("%02x".format(_)).mkString, "authentication")
    initRequest(s"REGISTER UUID=$uuid, TYPE=$wireType", "registration")

    val req = new StringBuilder(s"REQUEST-DATA $database.$table")
    version.foreach(v => req.append(s".$v"))
    gtid.foreach(g => req.append(s" $g"))
    writeBounded(req.toString.getBytes(UTF_8), "subscription")
  }

  /** Write a handshake phase and check the (≤1024 byte) reply. */
  private def initRequest(payload: String, phase: String): Unit = {
    writeBounded(payload.getBytes(UTF_8), phase)
    val reply = new Array[Byte](1024)
    val n = in.read(reply)
    if (n < 0) throw new MaxScaleProtocolException(s"$phase: connection closed")
    val text = new String(reply, 0, n, UTF_8).trim
    if (text.toUpperCase.startsWith("ERR"))
      throw new MaxScaleProtocolException(s"$phase failed: $text")
  }

  /** Protocol write with a deadline — parity with the reference, which
    * arms a write deadline around EVERY protocol write
    * (`gomaxscale.go:231-243` via `WithTimeout`,
    * `gomaxscale_options.go:60-65`); `SO_TIMEOUT` only bounds reads, so
    * without this a blocking write to a wedged server (zero TCP window
    * during connect/auth/register) hangs the client thread forever.
    * Java blocking sockets have no native write timeout, so the bound
    * is a watchdog: if the write hasn't completed within
    * `writeTimeoutMs` the socket is closed, which forces the blocked
    * `write` to fail immediately — the standard deadline idiom for
    * `java.net.Socket`. The timer task is cancelled on the fast path,
    * so a healthy write costs one schedule/cancel pair. */
  private[cdc] def writeBounded(payload: Array[Byte], phase: String): Unit = {
    // deadline accounting reads the injectable clock (the reference's
    // `timeRef().Add(write)` — CdcClock); the watchdog TIMER stays on
    // real time because it is what physically uncloses a wedged socket
    val armedAt = CdcClock.now()
    val expired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val task = new java.util.TimerTask {
      def run(): Unit = {
        expired.set(true)
        try socket.close() catch { case _: java.io.IOException => () }
      }
    }
    MaxScaleClient.writeDeadlineTimer.schedule(task, writeTimeoutMs.toLong)
    try {
      out.write(payload)
      out.flush()
    } catch {
      case e: java.io.IOException =>
        if (expired.get())
          throw new MaxScaleProtocolException(
            s"$phase: write deadline exceeded (${writeTimeoutMs}ms)")
        else throw e
    } finally task.cancel()
    // the timer may have fired in the window between the write
    // completing and cancel() running — the socket is then already
    // closed and the "successful" write must still surface as a
    // deadline error here, not as a bare 'Socket closed' on the NEXT
    // protocol read. The clock check carries the same judgment for an
    // injected time source: a write that completed after the deadline
    // PASSED (per CdcClock) is late, exactly as the reference's socket
    // deadline armed from timeRef would have failed it.
    if (expired.get() || CdcClock.now() - armedAt > writeTimeoutMs)
      throw new MaxScaleProtocolException(
        s"$phase: write deadline exceeded (${writeTimeoutMs}ms)")
  }

  /** Pull the next batch of decoded events. Empty on read timeout (the
    * stream is just idle); None (via EOF flag) when the server closed.
    */
  def poll(): PollResult = {
    val n =
      try in.read(readBuf)
      catch { case _: SocketTimeoutException => 0 }
    if (n < 0) {
      val tail =
        if (wireType == "AVRO") Nil
        else framer.finish().collect { case ByteJsonFramer.ServerText(t) => t }
      return PollResult(Nil, tail, eof = true)
    }
    if (n == 0) return PollResult(Nil, Nil, eof = false)
    if (wireType == "AVRO") pollAvro(n)
    else {
      // byte-level framing (ByteJsonFramer): the read buffer is scanned
      // in place and each frame is decoded to a String exactly once at
      // its boundary — no chunk-wide String, no per-frame StringBuilder
      val frames = framer.feed(readBuf, 0, n)
      val events = Vector.newBuilder[Either[String, CdcEvent]]
      val errors = Vector.newBuilder[String]
      frames.foreach {
        case ByteJsonFramer.Json(text) => events += CdcEvent.decode(text)
        case ByteJsonFramer.ServerText(t) => errors += t
      }
      PollResult(events.result(), errors.result(), eof = false)
    }
  }

  private def pollAvro(n: Int): PollResult = {
    val events = avroFramer.feed(readBuf, n).map {
      case AvroFramer.SchemaFrame(s) => Right(CdcAvro.schemaToDdl(s, database, table))
      case AvroFramer.RecordFrame(r) => CdcAvro.recordToDml(r)
    }
    PollResult(events, Nil, eof = false)
  }

  def close(): Unit = if (socket != null) socket.close()
}

object MaxScaleClient {
  /** One shared daemon timer for all clients' write deadlines — a
    * timer thread per write (or per client) would not scale to a
    * multi-table fan-in; scheduled tasks are cancelled on the write
    * fast path so the wheel stays empty in the healthy case. */
  private val writeDeadlineTimer =
    new java.util.Timer("maxscale-write-deadline", true)
}

final case class PollResult(
    events: Seq[Either[String, CdcEvent]],
    serverMessages: Seq[String],
    eof: Boolean)

final class MaxScaleProtocolException(msg: String) extends RuntimeException(msg)
