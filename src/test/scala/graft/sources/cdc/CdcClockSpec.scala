package graft.sources.cdc

import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong
import org.scalatest.funsuite.AnyFunSuite

/** The injectable clock seam ([[CdcClock]], the reference's `timeRef`
  * option, `gomaxscale_options.go:15,38` / `gomaxscale.go:232-240`):
  * a scripted time source must drive every deadline judgment, so tests
  * exercise timeout paths deterministically instead of sleeping real
  * wall-clock time out. */
class CdcClockSpec extends AnyFunSuite {

  private def withClock[A](clock: () => Long)(body: => A): A = {
    val prev = CdcClock.nowMillis
    CdcClock.nowMillis = clock
    try body finally CdcClock.nowMillis = prev
  }

  test("a write judged late by the injected clock fails the deadline") {
    val server = new ServerSocket(0)
    val handler = new Thread(() => {
      val s = server.accept()
      val in = s.getInputStream
      val out = s.getOutputStream
      val buf = new Array[Byte](1024)
      in.read(buf); out.write("OK".getBytes(UTF_8)); out.flush() // auth
      in.read(buf); out.write("OK".getBytes(UTF_8)); out.flush() // register
      in.read(buf) // REQUEST-DATA — keep serving so connect() succeeds
      Thread.sleep(30000)
    })
    handler.setDaemon(true)
    handler.start()

    val client = new MaxScaleClient(
      host = "127.0.0.1", port = server.getLocalPort,
      user = "u", password = "p", database = "example", table = "users",
      readTimeoutMs = 2000, writeTimeoutMs = 2000)
    try {
      client.connect()
      // clock leaps +60 s per reading: the NEXT write completes
      // instantly in real time yet is judged late (armed at t, checked
      // at t+60000 > 2000ms) — the reference's timeRef().Add(write)
      // semantics, with no wedged socket and no real waiting
      val t = new AtomicLong(0L)
      withClock(() => t.getAndAdd(60000L)) {
        val e = intercept[MaxScaleProtocolException] {
          client.writeBounded("ping".getBytes(UTF_8), "probe")
        }
        assert(e.getMessage.contains("write deadline exceeded"), e.getMessage)
      }
    } finally {
      client.close()
      server.close()
    }
  }

  test("AvailableNow drain bound follows the injected clock") {
    // no server: the receiver can't connect, so only the CLOCK can end
    // prepareForTriggerAvailableNow before availableNowMaxWaitMs. With
    // a +10 s-per-reading clock the 15 s bound is crossed after a
    // couple of loop iterations — wall time stays well under the bound.
    val stream = new MaxScaleCdcMicroBatchStream(Map(
      "host" -> "127.0.0.1", "port" -> "1", // nothing listens on port 1
      "user" -> "u", "password" -> "p",
      "database" -> "example", "table" -> "users",
      "availableNowMaxWaitMs" -> "15000", "availableNowIdleMs" -> "1000"))
    val t = new AtomicLong(0L)
    val t0 = System.nanoTime()
    withClock(() => t.getAndAdd(10000L)) {
      stream.prepareForTriggerAvailableNow()
    }
    val wallMs = (System.nanoTime() - t0) / 1000000
    assert(wallMs < 10000,
      s"drain bound ignored the injected clock: ${wallMs}ms wall time")
    stream.stop()
  }
}
