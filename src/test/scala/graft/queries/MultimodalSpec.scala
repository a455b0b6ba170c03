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

  test("resizePooled and patchFeatures replay in plain Scala on edge-case blobs") {
    import spark.implicits._
    // edge cases: 1 byte (one bucket), exactly 16, non-multiple of 16,
    // and a 0xff/0x00 alternation (max gradient)
    val blobs = Seq(
      DocBlob(1L, Array[Byte](42)),
      DocBlob(2L, (0 until 16).map(_.toByte).toArray),
      DocBlob(3L, (0 until 37).map(i => ((i * 53) % 256).toByte).toArray),
      DocBlob(4L, (0 until 32).map(i => if (i % 2 == 0) 0xff.toByte else 0x00.toByte).toArray))
    def replayPx(b: DocBlob) = {
      val n = b.data.length
      b.data.indices.groupBy(i => (i.toLong * 16 / n).toInt).toSeq.map {
        case (k, is) =>
          (b.doc_id, k, is.map(b.data(_) & 0xff).map(_.toLong).sum / is.size, is.size.toLong)
      }
    }
    def replayFeat(b: DocBlob) = {
      val n = b.data.length
      (0 until n - 1).groupBy(i => (i.toLong * 16 / n).toInt).toSeq.map {
        case (k, is) =>
          (b.doc_id, k, is.map(i => math.abs((b.data(i + 1) & 0xff) - (b.data(i) & 0xff)).toLong).sum,
            is.size.toLong)
      }
    }
    val ds = spark.createDataset(blobs).repartition(3)
    assert(Multimodal.resizePooled(ds).collect()
      .map(p => (p.doc_id, p.bucket, p.px, p.n_in)).toSet ==
      blobs.flatMap(replayPx).toSet)
    assert(Multimodal.patchFeatures(ds).collect()
      .map(p => (p.doc_id, p.bucket, p.edge_energy, p.n_edges)).toSet ==
      blobs.flatMap(replayFeat).toSet)
    // the max-gradient blob: every adjacent pair differs by 255
    val feats4 = blobs.flatMap(replayFeat).filter(_._1 == 4L)
    assert(feats4.map(_._3).sum == 255L * 31)
  }

  test("resizeImageReal resamples pixels byte-for-byte (nearest neighbor)") {
    for ((w, h) <- Seq((7, 3), (64, 64), (123, 457))) {
      val bytes = imageBytes(w, h, "png") // PNG is lossless — pixels exact
      val (ow, oh) = (5, 4)
      val got = Multimodal.resizeImageReal(bytes, ow, oh)
      // plain replay over the KNOWN generator pixels
      val want = for (y <- 0 until oh; x <- 0 until ow) yield {
        val rgb = (x * w / ow * 31 + y * h / oh * 7) & 0xffffff
        (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
      }
      assert(got.toSeq == want.toSeq, s"${w}x$h → ${ow}x$oh mismatch")
    }
  }
}
