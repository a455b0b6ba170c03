package graft.sources.cdc

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential contract of the hand-rolled DML envelope fast path
  * ([[CdcEvent.decodeDmlFast]]) against the Jackson streaming decode
  * ([[CdcEvent.decodeDml]], the semantics anchor):
  *
  *  1. SOUND — whenever the fast scanner accepts (non-null), Jackson
  *     accepts the same text with IDENTICAL envelope fields; a fast
  *     accept where Jackson rejects, or with different values, is a
  *     divergence failure. Checked on random valid events AND random
  *     mutations (truncation, injection, deletion, swaps).
  *  2. LIVE — on the clean wire shape (the avro router's output, the
  *     ingest bench's event stream) the fast path actually fires; a
  *     silent always-bail would quietly put Jackson back on the hot
  *     path.
  *
  * Completeness on bail is NOT required — bailing is the designed
  * response to anything unexpected — so mutations only assert
  * soundness, never that the fast path accepted.
  */
class CdcEventFastSpec extends AnyFunSuite {

  private def envelope(d: DmlEvent): (Int, Int, Long, Long, Long, String) =
    (d.domain, d.serverId, d.sequence, d.eventNumber, d.timestamp, d.eventKind)

  /** Soundness check for one input; returns true if the fast path
    * accepted it. */
  private def checkSound(json: String): Boolean = {
    val fast = CdcEvent.decodeDmlFast(json)
    if (fast == null) false
    else {
      val jackson =
        try CdcEvent.decodeDml(json)
        catch { case e: Exception => Left(s"threw: ${e.getMessage}") }
      jackson match {
        case Right(j: DmlEvent) =>
          assert(envelope(fast) == envelope(j), s"field divergence on: $json")
          assert(fast.rawJson == j.rawJson)
        case other =>
          fail(s"fast accepted what Jackson rejects ($other): $json")
      }
      true
    }
  }

  test("clean wire event: fast path fires and matches Jackson") {
    val ev = """{"domain":0,"server_id":1,"sequence":42,"event_number":7,"timestamp":1754956800,"event_type":"insert","id":9,"name":"user-9"}"""
    assert(checkSound(ev), "fast path must accept the wire shape")
    val d = CdcEvent.decode(ev).toOption.get.asInstanceOf[DmlEvent]
    assert(envelope(d) == ((0, 1, 42L, 7L, 1754956800L, "insert")))
  }

  test("payload escapes, unicode, floats, literals stay on the fast path") {
    val cases = Seq(
      """{"domain":0,"server_id":1,"sequence":1,"event_number":1,"timestamp":5,"event_type":"insert","t":"a\"b\\c\ndé"}""",
      """{"domain":0,"server_id":1,"sequence":2,"event_number":1,"timestamp":5,"event_type":"update_after","price":-12.5e3,"ok":true,"x":null,"y":false}""",
      """{"domain":0,"server_id":1,"sequence":3,"event_number":1,"timestamp":5,"event_type":"delete","t":"héllo → 🌍","u":"Aé"}""",
      """{ "domain" : 0 , "server_id" : 1 , "sequence" : 4 , "event_number" : 1 , "timestamp" : 5 , "event_type" : "insert" }""",
      """{"sequence":6,"domain":0,"event_type":"insert","server_id":1,"event_number":1,"timestamp":5}""", // reordered
      """{"domain":0,"server_id":1,"sequence":7,"event_number":1,"timestamp":5}""" // no event_type
    )
    cases.foreach(ev => assert(checkSound(ev), s"fast path must accept: $ev"))
  }

  test("conservative bails: nested values, coercions, escapes in event_type") {
    val cases = Seq(
      // nested payload value — not the flat row shape
      """{"domain":0,"server_id":1,"sequence":1,"event_number":1,"timestamp":5,"event_type":"insert","o":{"a":1},"l":[1,2]}""",
      // string-typed envelope numeric (Jackson coerces "3" → 3)
      """{"domain":"3","server_id":1,"sequence":2,"event_number":1,"timestamp":5,"event_type":"insert"}""",
      // negative envelope numeric
      """{"domain":-1,"server_id":1,"sequence":3,"event_number":1,"timestamp":5,"event_type":"insert"}""",
      // escape inside event_type (a valid escaped backslash — the
      // fast path only takes escape-free strings there)
      """{"domain":0,"server_id":1,"sequence":4,"event_number":1,"timestamp":5,"event_type":"ins\\u0065rt"}""",
      // null event_type
      """{"domain":0,"server_id":1,"sequence":5,"event_number":1,"timestamp":5,"event_type":null}""",
      // leading zero — strict JSON forbids it
      """{"domain":00,"server_id":1,"sequence":6,"event_number":1,"timestamp":5,"event_type":"insert"}""",
      // raw control char inside event_type — Jackson rejects it as
      // malformed; the fast path must bail, never accept (the one
      // divergence a code review caught before the alphabet below
      // covered control chars)
      "{\"domain\":0,\"server_id\":1,\"sequence\":7,\"event_number\":1,\"timestamp\":5,\"event_type\":\"in\tsert\"}",
      // raw control char inside a member NAME
      "{\"domain\":0,\"server_id\":1,\"se\tquence\":8,\"event_number\":1,\"timestamp\":5,\"event_type\":\"insert\"}"
    )
    cases.foreach { ev =>
      assert(CdcEvent.decodeDmlFast(ev) == null, s"must bail on: $ev")
    }
    // and the public decode still resolves them exactly as Jackson does
    // (the first two are valid JSON and decode; the rest are Jackson's
    // judgment call, surfaced as its Left or coercion)
    cases.foreach(ev => CdcEvent.decode(ev)) // must not throw
  }

  test("property: random flat events are sound and mostly fast-path") {
    val r = new Random(1234)
    def str(len: Int): String = {
      val cps = Array("a", "z", "0", " ", "é", "→", "🌍", "\\\\", "\\\"",
        "\\n", "\\u0041", "{", "}", ":", ",")
      (0 until len).map(_ => cps(r.nextInt(cps.length))).mkString
    }
    var accepted = 0
    val total = 2000
    for (_ <- 0 until total) {
      val payload = (0 until r.nextInt(5)).map { k =>
        r.nextInt(4) match {
          case 0 => s""""p$k":${r.nextInt(100000)}"""
          case 1 => s""""p$k":${r.nextInt(1000)}.${r.nextInt(99)}"""
          case 2 => s""""p$k":"${str(r.nextInt(10))}""""
          case _ => s""""p$k":${Seq("true", "false", "null")(r.nextInt(3))}"""
        }
      }
      val env = Seq(
        s""""domain":${r.nextInt(4)}""",
        s""""server_id":${r.nextInt(9) + 1}""",
        s""""sequence":${r.nextLong(1L << 40)}""",
        s""""event_number":${r.nextInt(5) + 1}""",
        s""""timestamp":${1700000000L + r.nextInt(1000000)}""",
        s""""event_type":"${Seq("insert", "update_before", "update_after", "delete")(r.nextInt(4))}""""
      )
      val ev = (env ++ payload).mkString("{", ",", "}")
      if (checkSound(ev)) accepted += 1
    }
    // LIVE: the flat generator never produces a bail shape
    assert(accepted == total, s"fast path accepted $accepted of $total flat events")
  }

  test("property: random mutations never make the fast path unsound") {
    val r = new Random(99)
    val base = """{"domain":0,"server_id":1,"sequence":42,"event_number":7,"timestamp":1754956800,"event_type":"insert","id":9,"name":"us\"er-9","v":1.5}"""
    for (_ <- 0 until 5000) {
      val mutated = r.nextInt(4) match {
        case 0 => base.substring(0, 1 + r.nextInt(base.length - 1)) // truncate
        case 1 => // inject one char (incl. raw control chars — the
          // class where a too-permissive scanner diverges from Jackson)
          val p = r.nextInt(base.length)
          val alphabet = "{}[]\",:x\\7\t\n"
          base.substring(0, p) + alphabet.charAt(r.nextInt(alphabet.length)) + base.substring(p)
        case 2 => // delete one char
          val p = r.nextInt(base.length)
          base.substring(0, p) + base.substring(p + 1)
        case _ => // swap two adjacent chars
          val p = 1 + r.nextInt(base.length - 3)
          base.substring(0, p) + base.charAt(p + 1) + base.charAt(p) + base.substring(p + 2)
      }
      checkSound(mutated) // asserts internally when fast accepts
    }
  }
}
