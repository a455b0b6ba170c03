package graft.queries

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkTestSession
import graft.queries.Multimodal.{DocBlob, MultimodalStub}
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

/** Real image decode (JDK ImageIO) through the multimodal mapPartitions
  * pipeline: PNGs and JPEGs are generated in-test (`ImageIO.write` of a
  * `BufferedImage`) and their dimensions recovered distributed-side. */
class MultimodalSpec extends AnyFunSuite with SparkTestSession {

  private def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // deterministic non-constant pixels so JPEG has real content to code
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, out), s"no $format writer in this JDK")
    out.toByteArray
  }

  private val dims = Seq((1, 1), (7, 3), (64, 64), (640, 480), (123, 457))

  test("decodeImageReal reads PNG and JPEG headers") {
    for ((w, h) <- dims; fmt <- Seq("png", "jpg")) {
      val (gw, gh, gf) = MultimodalStub.decodeImageReal(imageBytes(w, h, fmt))
      assert((gw, gh) == (w, h), s"$fmt ${w}x$h decoded as ${gw}x$gh")
      assert(gf == (if (fmt == "png") "png" else "jpeg"))
    }
  }

  test("imageMeta recovers dimensions through the mapPartitions pipeline") {
    import spark.implicits._
    val blobs = dims.zipWithIndex.map { case ((w, h), i) =>
      DocBlob(i.toLong, imageBytes(w, h, if (i % 2 == 0) "png" else "jpg"))
    }
    val got = Multimodal.imageMeta(
        spark.createDataset(blobs).repartition(3))
      .collect().map(m => m.doc_id -> ((m.width, m.height))).toMap
    val want = dims.zipWithIndex.map { case (wh, i) => i.toLong -> wh }.toMap
    assert(got == want)
  }

  test("undecodable bytes raise a clear error, not a null row") {
    val e = intercept[IllegalArgumentException] {
      MultimodalStub.decodeImageReal("definitely not an image".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("ImageIO"))
  }
}
