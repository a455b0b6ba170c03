package graft.sources.cdc

/** Scratch probe (not part of the driver contract): single-connection
  * drain rate vs the client read-buffer size. The reference defaults
  * to 4096 (`gomaxscale_options.go`), which the bench keeps for the
  * reference-comparable headline; this measures what the knob buys so
  * the tuning note in PLAN_NOTES is a measurement, not a guess.
  * Usage: sbt "Test/runMain graft.sources.cdc.IngestBufferProbe"
  */
object IngestBufferProbe {
  def main(args: Array[String]): Unit = {
    val base = (1 to 1200000).map(i =>
      s"""{"domain":0,"server_id":1,"sequence":$i,"event_number":1,"timestamp":1754956800,"event_type":"insert","id":$i,"name":"user-$i"}""").toArray
    val stream: IndexedSeq[String] = new IndexedSeq[String] {
      val length: Int = 8 * base.length
      def apply(i: Int): String = base(i % base.length)
    }
    def rate(bufferSize: Int): Double = {
      System.gc(); Thread.sleep(200)
      val server = new testkit.MockMaxScaleServer(events = stream)
      val client = new MaxScaleClient(host = "127.0.0.1", port = server.port,
        user = "b", password = "b", database = "example", table = "users",
        readTimeoutMs = 2000, bufferSize = bufferSize)
      client.connect()
      var count = 0
      var eof = false
      val w0 = System.nanoTime()
      while (!eof && (count < 50000 || (System.nanoTime() - w0) / 1e9 < 0.8)) {
        val r = client.poll(); count += r.events.size; eof = r.eof
      }
      var best = -1.0
      for (_ <- 1 to 6 if !eof) {
        val start = count
        val t0 = System.nanoTime()
        var el = 0.0
        while (!eof && el < 0.5) {
          val r = client.poll(); count += r.events.size; eof = r.eof
          el = (System.nanoTime() - t0) / 1e9
        }
        if (el >= 0.2) best = math.max(best, (count - start) / el)
      }
      client.close()
      best
    }
    rate(4096) // JIT warm
    for (bs <- Seq(1024, 4096, 16384, 65536, 262144))
      println(f"PROBE buffer=$bs%7d rate=${rate(bs)}%.0f ev/s")
  }
}
