package graft.sources.cdc

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Byte framer invariants: identical frame stream to the char-level
  * [[JsonFramer]] (the independent semantics oracle) under random
  * inputs and random BYTE-level splits — a strictly stronger chunking
  * model than JsonFramerSpec's, because a byte split can land INSIDE a
  * multi-byte UTF-8 code point (a char split cannot), both inside
  * string values and inside server text.
  */
class ByteJsonFramerSpec extends AnyFunSuite {

  private def byteFrames(chunks: Seq[Array[Byte]]): Seq[ByteJsonFramer.Frame] = {
    val f = new ByteJsonFramer
    chunks.flatMap(c => f.feed(c, 0, c.length)) ++ f.finish()
  }

  private def charFrames(stream: String, chunkLen: Int): Seq[(Boolean, String)] = {
    val f = new JsonFramer
    (stream.grouped(chunkLen).toSeq.flatMap(f.feed) ++ f.finish()).map {
      case f.Json(t) => (true, t)
      case f.ServerText(t) => (false, t)
    }
  }

  private def norm(fs: Seq[ByteJsonFramer.Frame]): Seq[(Boolean, String)] =
    fs.map {
      case ByteJsonFramer.Json(t) => (true, t)
      case ByteJsonFramer.ServerText(t) => (false, t)
    }

  private def splitRandomly(bytes: Array[Byte], r: Random): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var i = 0
    while (i < bytes.length) {
      val len = math.min(1 + r.nextInt(7), bytes.length - i)
      out += java.util.Arrays.copyOfRange(bytes, i, i + len)
      i += len
    }
    out.toSeq
  }

  test("simple objects split across reads") {
    val out = byteFrames(Seq("""{"a":1}{"b"""", """:2}""").map(_.getBytes(UTF_8)))
    assert(out == Seq(ByteJsonFramer.Json("""{"a":1}"""),
      ByteJsonFramer.Json("""{"b":2}""")))
  }

  test("frame decoded once even when a UTF-8 code point straddles the read boundary") {
    val obj = """{"s":"héllo → 🌍"}"""
    val bytes = obj.getBytes(UTF_8)
    // split at EVERY byte position, including mid-code-point
    for (cut <- 1 until bytes.length) {
      val out = byteFrames(Seq(
        java.util.Arrays.copyOfRange(bytes, 0, cut),
        java.util.Arrays.copyOfRange(bytes, cut, bytes.length)))
      assert(out == Seq(ByteJsonFramer.Json(obj)), s"cut=$cut")
    }
  }

  test("server text with multi-byte chars split mid-code-point survives") {
    val stream = """{"a":1}ERR überlast 🌍{"b":2}"""
    val bytes = stream.getBytes(UTF_8)
    val r = new Random(7)
    for (_ <- 0 until 50) {
      val out = byteFrames(splitRandomly(bytes, r))
      assert(out == Seq(ByteJsonFramer.Json("""{"a":1}"""),
        ByteJsonFramer.ServerText("ERR überlast 🌍"),
        ByteJsonFramer.Json("""{"b":2}""")))
    }
  }

  test("braces and escapes inside strings do not break framing") {
    val tricky = """{"s":"}{\"{","n":{"m":"{{{"}}"""
    val bytes = tricky.getBytes(UTF_8)
    val out = byteFrames(bytes.grouped(3).toSeq)
    assert(out == Seq(ByteJsonFramer.Json(tricky)))
  }

  // --- differential property: byte framer == char framer on random
  // streams (ASCII + multi-byte), under independent random splits

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def randomString(r: Random): String = {
    // whole code points (indexing a char array would split 🌍's
    // surrogate pair into unpaired halves, which UTF-8 cannot encode)
    val cps = Array("a", "b", "{", "}", ":", "\"", " ", "\\", "c", "d",
      "é", "→", "🌍") // 1/2/3/4-byte UTF-8
    (0 until r.nextInt(12)).map(_ => cps(r.nextInt(cps.length))).mkString
  }

  private def randomObj(r: Random, depth: Int): String = {
    val n = r.nextInt(5)
    val fields = (0 until n).map { i =>
      val v =
        if (depth > 0 && r.nextInt(4) == 0) randomObj(r, depth - 1)
        else if (r.nextBoolean()) r.nextInt(2000).toString
        else quote(randomString(r))
      quote(s"k$i") + ":" + v
    }
    fields.mkString("{", ",", "}")
  }

  test("property: byte framer matches the char-framer oracle on random streams and splits") {
    val r = new Random(42)
    for (_ <- 0 until 300) {
      val parts = (0 until 1 + r.nextInt(5)).map { _ =>
        if (r.nextInt(5) == 0) s"ERR x${r.nextInt(100)} " else randomObj(r, 2)
      }
      val stream = parts.mkString
      val byteOut = norm(byteFrames(splitRandomly(stream.getBytes(UTF_8), r)))
      val charOut = charFrames(stream, 1 + r.nextInt(7))
      assert(byteOut == charOut, s"stream=$stream")
    }
  }

  test("property: random byte splits of random object streams reassemble exactly") {
    val r = new Random(4242)
    for (_ <- 0 until 300) {
      val objs = List.fill(1 + r.nextInt(5))(randomObj(r, 2))
      val bytes = objs.mkString.getBytes(UTF_8)
      val out = byteFrames(splitRandomly(bytes, r))
      assert(out.collect { case ByteJsonFramer.Json(t) => t } == objs)
    }
  }
}
