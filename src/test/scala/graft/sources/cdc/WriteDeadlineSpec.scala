package graft.sources.cdc

import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite

/** Write-deadline parity with the reference, which arms a write deadline
  * around every protocol write (`gomaxscale.go:231-243`,
  * `gomaxscale_options.go:60-65`): a server that accepts the connection
  * but stops reading (zero TCP window) must fail a blocked protocol
  * write within the configured deadline instead of hanging the client
  * thread forever. */
class WriteDeadlineSpec extends AnyFunSuite {

  test("a blocked protocol write fails within the write deadline") {
    val server = new ServerSocket(0)
    val handler = new Thread(() => {
      val s = server.accept()
      val in = s.getInputStream
      val out = s.getOutputStream
      val buf = new Array[Byte](1024)
      // serve the two handshake phases, then go deaf: never read again,
      // so the client's send buffer fills and its next big write blocks
      in.read(buf); out.write("OK".getBytes(UTF_8)); out.flush() // auth
      in.read(buf); out.write("OK".getBytes(UTF_8)); out.flush() // register
      Thread.sleep(60000)
    })
    handler.setDaemon(true)
    handler.start()

    val client = new MaxScaleClient(
      host = "127.0.0.1", port = server.getLocalPort,
      user = "u", password = "p", database = "example", table = "users",
      readTimeoutMs = 2000, writeTimeoutMs = 500)
    try {
      client.connect() // handshake writes are served; REQUEST-DATA is tiny
      val t0 = System.nanoTime()
      // 64 MiB cannot fit any kernel send buffer, so with the server
      // deaf this write MUST block — the watchdog has to break it
      val e = intercept[MaxScaleProtocolException] {
        client.writeBounded(new Array[Byte](64 << 20), "probe")
      }
      val elapsedMs = (System.nanoTime() - t0) / 1000000
      assert(e.getMessage.contains("write deadline exceeded"), e.getMessage)
      assert(elapsedMs < 5000,
        s"write took ${elapsedMs}ms — deadline (500ms) did not bound it")
    } finally {
      client.close()
      server.close()
    }
  }
}
