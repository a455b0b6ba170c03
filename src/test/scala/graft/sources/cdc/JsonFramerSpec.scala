package graft.sources.cdc

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Framer reassembly invariants (SURVEY.md §5.2 item 3): any chunking of
  * a concatenation of JSON objects and non-JSON server text must
  * reassemble the exact original sequence — including braces inside
  * string values, which the reference framer miscounts
  * (`stream.go:45-53`).
  */
class JsonFramerSpec extends AnyFunSuite {

  private def frames(framer: JsonFramer, chunks: Seq[String]) =
    chunks.flatMap(framer.feed) ++ framer.finish()

  test("simple objects split across reads") {
    val f = new JsonFramer
    val out = frames(f, Seq("""{"a":1}{"b"""", """:2}"""))
    assert(out == Seq(f.Json("""{"a":1}"""), f.Json("""{"b":2}""")))
  }

  test("braces and escapes inside strings do not break framing") {
    val f = new JsonFramer
    val tricky = """{"s":"}{\"{","n":{"m":"{{{"}}"""
    val out = frames(f, tricky.grouped(3).toSeq)
    assert(out == Seq(f.Json(tricky)))
  }

  test("non-JSON server text between objects is captured, even across chunks") {
    val f = new JsonFramer
    val out = frames(f, Seq("""{"a":1}ERR something """, """bad{"b":2}"""))
    assert(out == Seq(f.Json("""{"a":1}"""), f.ServerText("ERR something bad"),
      f.Json("""{"b":2}""")))
  }

  // --- property: random events + random chunk splits reassemble exactly

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def randomString(r: Random): String = {
    val chars = "ab{}:\" \\cd".toCharArray
    (0 until r.nextInt(12)).map(_ => chars(r.nextInt(chars.length))).mkString
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

  test("property: any chunking of any object stream reassembles exactly") {
    val r = new Random(42)
    for (_ <- 0 until 300) {
      val objs = List.fill(1 + r.nextInt(5))(randomObj(r, 2))
      val stream = objs.mkString
      val chunkLen = 1 + r.nextInt(7)
      val f = new JsonFramer
      val out = frames(f, stream.grouped(chunkLen).toSeq)
      assert(out.collect { case f.Json(t) => t } == objs, s"stream=$stream")
    }
  }
}
