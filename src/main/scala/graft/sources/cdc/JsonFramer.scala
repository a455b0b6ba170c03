package graft.sources.cdc

import scala.collection.mutable

/** Incremental byte-stream → JSON-object framer for the MaxScale CDC
  * wire format.
  *
  * The transport interleaves complete JSON objects (DDL/DML events) with
  * free-form non-JSON error text, and objects may be split across
  * arbitrary read boundaries (reference behavior: `stream.go:28-117`).
  * This framer tracks brace depth **string-aware** — the reference's
  * counter is string-blind (`stream.go:45-53`) and miscounts braces
  * inside JSON string values; we implement the intended semantics
  * (SURVEY.md §7.3 "quirks we intentionally do not replicate").
  *
  * State is O(current object), so a source task can stream arbitrarily
  * large feeds; at scale one framer instance lives per source partition.
  */
final class JsonFramer {

  sealed trait Frame
  /** A complete JSON object (bytes as UTF-8 string). */
  final case class Json(text: String) extends Frame
  /** Non-JSON server text seen between objects (e.g. "ERR ..."). */
  final case class ServerText(text: String) extends Frame

  private val buf = new StringBuilder
  private val pending = new StringBuilder // non-JSON run outside objects
  private var depth = 0
  private var inString = false
  private var escaped = false

  /** Feed one chunk; returns every frame completed by it, in order. */
  def feed(chunk: String): Seq[Frame] = {
    val out = mutable.ArrayBuffer.empty[Frame]
    var i = 0
    while (i < chunk.length) {
      val c = chunk.charAt(i)
      if (depth == 0) {
        if (c == '{') {
          flushPending(out)
          depth = 1
          buf.append(c)
        } else {
          pending.append(c)
        }
      } else {
        buf.append(c)
        if (inString) {
          if (escaped) escaped = false
          else if (c == '\\') escaped = true
          else if (c == '"') inString = false
        } else c match {
          case '"' => inString = true
          case '{' => depth += 1
          case '}' =>
            depth -= 1
            if (depth == 0) {
              out += Json(buf.result())
              buf.clear()
            }
          case _ =>
        }
      }
      i += 1
    }
    // Unlike the reference (which requires non-JSON text to fit one read,
    // `stream.go:86-87`), we only flush server text once a JSON object
    // begins or the caller finalizes — no chunk-boundary loss.
    out.toSeq
  }

  /** Flush any trailing non-JSON text (call on EOF). */
  def finish(): Seq[Frame] = {
    val out = mutable.ArrayBuffer.empty[Frame]
    flushPending(out)
    out.toSeq
  }

  private def flushPending(out: mutable.ArrayBuffer[Frame]): Unit = {
    val s = pending.result().trim
    pending.clear()
    if (s.nonEmpty) out += ServerText(s)
  }
}
