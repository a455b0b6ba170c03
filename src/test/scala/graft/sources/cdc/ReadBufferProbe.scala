package graft.sources.cdc

/** Ad-hoc read-buffer sweep (Test/runMain
  * graft.sources.cdc.ReadBufferProbe): single-connection drain rate at
  * several client `bufferSize` values, now that the parse path (byte
  * framing + envelope fast scan) no longer dominates. The BENCH
  * headline deliberately stays at the reference-default 4096
  * (`gomaxscale.go` reads into a 4096 buffer) for comparability; this
  * probe records what the knob is worth at deployment time. Manual
  * instrument like DecodeProfile — not part of the suite.
  */
object ReadBufferProbe {
  def main(args: Array[String]): Unit = {
    val events = (1 to 1200000).map(i =>
      s"""{"domain":0,"server_id":1,"sequence":$i,"event_number":1,"timestamp":1754956800,"event_type":"insert","id":$i,"name":"user-$i"}""").toArray
    val stream: IndexedSeq[String] = new IndexedSeq[String] {
      val length: Int = 8 * events.length
      def apply(i: Int): String = events(i % events.length)
    }
    def run(buf: Int): Double = {
      System.gc(); Thread.sleep(100)
      val server = new testkit.MockMaxScaleServer(events = stream)
      val client = new MaxScaleClient(host = "127.0.0.1", port = server.port,
        user = "b", password = "b", database = "example", table = "users",
        readTimeoutMs = 2000, bufferSize = buf)
      client.connect()
      var count = 0
      var eof = false
      val w0 = System.nanoTime()
      while (!eof && (count < 50000 || (System.nanoTime() - w0) / 1e9 < 0.8)) {
        val r = client.poll(); count += r.events.size; eof = r.eof
      }
      var best = -1.0
      var w = 0
      while (!eof && w < 8) {
        val start = count
        val t0 = System.nanoTime()
        var el = 0.0
        while (!eof && el < 0.5) {
          val r = client.poll(); count += r.events.size; eof = r.eof
          el = (System.nanoTime() - t0) / 1e9
        }
        if (el >= 0.2) best = math.max(best, (count - start) / el)
        w += 1
      }
      client.close()
      best
    }
    run(4096) // JIT warm
    for (buf <- Seq(1024, 4096, 16384, 65536, 262144)) {
      val r = (1 to 2).map(_ => run(buf)).max
      println(f"buffer ${buf}%7d  ${r / 1000}%8.0fk ev/s")
    }
  }
}
