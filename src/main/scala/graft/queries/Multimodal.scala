package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Opaque-binary ("multimodal") column plumbing.
  *
  * The Spark shape throughout is a typed `Dataset[DocBlob]` over a
  * `binary` column and `mapPartitions` batches (the Scala analog of
  * `mapInPandas` — per-partition iterator, decoder state amortized across
  * a partition) producing a typed metadata schema.
  *
  * Two decoders plug into that shape:
  *  - [[MultimodalStub.decodeStub]], a deterministic fake whose output is
  *    a pure function of the bytes, so the ORACLE-facing q53 stays
  *    checkable in plain SQL (the fixture "blob" is the UTF-8 bytes of
  *    `documents.text` — not a real image, so a real decoder can't apply);
  *  - [[MultimodalStub.decodeImageReal]] + [[imageMeta]], a REAL
  *    PNG/JPEG/GIF/BMP header decode via JDK `javax.imageio` (no native
  *    libs needed) — header-only (`ImageReader.getWidth(0)` reads the
  *    SOF/IHDR metadata without decompressing pixel data), which is the
  *    100 TB-correct choice when only dimensions are wanted. Exercised by
  *    `MultimodalSpec` round-tripping generated PNGs/JPEGs through the
  *    same mapPartitions pipeline.
  */
object Multimodal {

  final case class DocBlob(doc_id: Long, data: Array[Byte])
  final case class BlobMeta(doc_id: Long, n_bytes: Int, first_byte: Int,
      fake_width: Int, fake_height: Int, content_md5: String)
  final case class ImageMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
      format: String)

  object MultimodalStub {
    /** Deterministic fake of an image-header decode. A real decoder would
      * parse `data` here (e.g. JPEG SOF markers → width/height). */
    def decodeStub(b: DocBlob): BlobMeta = {
      val n = b.data.length
      val md = java.security.MessageDigest.getInstance("MD5").digest(b.data)
        .map("%02x".format(_)).mkString
      BlobMeta(b.doc_id, n, b.data(0) & 0xff, 64 + n % 512, 64 + (n * 7) % 512, md)
    }

    /** Real image-header decode via JDK ImageIO: (width, height, format).
      * Header-only — `getWidth(0)`/`getHeight(0)` parse the stream
      * metadata (PNG IHDR / JPEG SOF) without decoding pixel data, so a
      * 20 MB photo costs a few hundred header bytes of work. */
    def decodeImageReal(data: Array[Byte]): (Int, Int, String) = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(data))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext)
          throw new IllegalArgumentException("no ImageIO reader recognizes these bytes")
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          (r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase)
        } finally r.dispose()
      } finally iis.close()
    }
  }

  /** The real-decoder pipeline: same mapPartitions batch shape as q53,
    * with [[MultimodalStub.decodeImageReal]] as the per-blob kernel. */
  def imageMeta(blobs: org.apache.spark.sql.Dataset[DocBlob]): org.apache.spark.sql.Dataset[ImageMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      val (w, h, fmt) = MultimodalStub.decodeImageReal(b.data)
      ImageMeta(b.doc_id, b.data.length, w, h, fmt)
    })
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q53_multimodal_meta",
      (s, d) => {
        import s.implicits._
        Tables(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("data"))
          .as[DocBlob]
          .mapPartitions(_.map(MultimodalStub.decodeStub))
          .toDF()
          .orderBy(col("doc_id"))
      },
      Some("SELECT doc_id, CAST(length(text) AS INT) AS n_bytes, " +
        "ascii(substring(text, 1, 1)) AS first_byte, " +
        "CAST(64 + length(text) % 512 AS INT) AS fake_width, " +
        "CAST(64 + (length(text) * 7) % 512 AS INT) AS fake_height, " +
        "md5(text) AS content_md5 FROM documents ORDER BY doc_id")),

    QueryDef("q53b_frame_sample",
      // frame sampling over an opaque binary: up to 4 fixed-stride
      // 256-byte frames per blob, one output row per sampled frame —
      // the explode-per-frame batch shape a video pipeline uses (frame
      // decode itself would plug into the stub of q53)
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"), col("text"),
          explode(expr("filter(transform(sequence(0, 3), i -> i * 256), o -> o < length(text))")).as("off"))
        .select(col("doc_id"), (col("off") / 256).cast("int").as("frame_idx"),
          expr("ascii(substr(text, off + 1, 1))").as("first_byte"),
          expr("length(substr(text, off + 1, 256))").as("frame_bytes"))
        .orderBy(col("doc_id"), col("frame_idx")),
      Some("SELECT doc_id, CAST(off/256 AS INT) AS frame_idx, " +
        "ascii(substring(text, off + 1, 1)) AS first_byte, " +
        "CAST(length(substring(text, off + 1, 256)) AS INT) AS frame_bytes " +
        "FROM (SELECT doc_id, text, UNNEST([0, 256, 512, 768]) AS off FROM documents) " +
        "WHERE off < length(text) ORDER BY doc_id, frame_idx")))
}
