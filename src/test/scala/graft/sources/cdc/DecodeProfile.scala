package graft.sources.cdc

/** Ad-hoc wire-path cost decomposition (Test/runMain
  * graft.sources.cdc.DecodeProfile): times the byte framer and the
  * event decode separately over the same synthetic insert stream the
  * ingest bench uses, so "what is the next ceiling" is measured, not
  * guessed. Not part of the suite — a manual instrument like
  * ScaleProbe / CompactionScaleProbe.
  */
object DecodeProfile {
  def main(args: Array[String]): Unit = {
    val n = 1200000
    val events = (1 to n).map(i =>
      s"""{"domain":0,"server_id":1,"sequence":$i,"event_number":1,"timestamp":1754956800,"event_type":"insert","id":$i,"name":"user-$i"}""").toArray
    val blob = events.mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val chunk = 4096

    def timeIt(tag: String)(body: => Long): Unit = {
      // warm twice, time third
      body; body
      val t0 = System.nanoTime()
      val x = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-28s ${n / dt / 1000}%8.0fk ev/s  (sink=$x)")
    }

    for (round <- 1 to 2) {
    println(s"-- round $round")
    timeIt("frame (bytes)") {
      val f = new ByteJsonFramer
      var i = 0
      var count = 0L
      while (i < blob.length) {
        val len = math.min(chunk, blob.length - i)
        count += f.feed(blob, i, len).size
        i += len
      }
      require(count >= n, s"framed $count of $n"); count
    }

    timeIt("frame (bytes) via copy") {
      // the client's real shape: a reused read buffer per poll
      val f = new ByteJsonFramer
      val buf = new Array[Byte](chunk)
      var i = 0
      var count = 0L
      while (i < blob.length) {
        val len = math.min(chunk, blob.length - i)
        System.arraycopy(blob, i, buf, 0, len)
        count += f.feed(buf, 0, len).size
        i += len
      }
      count
    }

    timeIt("decode (public = fast path)") {
      var i = 0
      var sink = 0L
      while (i < n) {
        CdcEvent.decode(events(i)) match {
          case Right(d: DmlEvent) => sink += d.sequence
          case _ => ()
        }
        i += 1
      }
      sink
    }

    timeIt("decode (jackson anchor)") {
      var i = 0
      var sink = 0L
      while (i < n) {
        CdcEvent.decodeDml(events(i)) match {
          case Right(d: DmlEvent) => sink += d.sequence
          case _ => ()
        }
        i += 1
      }
      sink
    }

    timeIt("frame+decode (poll shape)") {
      val f = new ByteJsonFramer
      var i = 0
      var sink = 0L
      while (i < blob.length) {
        val len = math.min(chunk, blob.length - i)
        f.feed(blob, i, len).foreach {
          case ByteJsonFramer.Json(t) => CdcEvent.decode(t) match {
            case Right(d: DmlEvent) => sink += d.sequence
            case _ => ()
          }
          case _ => ()
        }
        i += len
      }
      sink
    }
    }
  }
}
