package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Opaque-binary ("multimodal") column plumbing.
  *
  * Real image/audio decoders aren't in this container, so the decode step
  * is a clearly-marked deterministic stub ([[MultimodalStub.decodeStub]])
  * while everything Spark-side is real: a typed `Dataset[DocBlob]` over a
  * `binary` column, `mapPartitions` batch shape (the Scala analog of
  * `mapInPandas` — per-partition iterator, decoder state amortized across
  * a partition), and a typed metadata schema out. Swapping the stub for a
  * JPEG/ffmpeg decoder changes one function.
  *
  * The fixture "blob" is the UTF-8 bytes of `documents.text`, so the stub
  * metadata is oracle-checkable in plain SQL.
  */
object Multimodal {

  final case class DocBlob(doc_id: Long, data: Array[Byte])
  final case class BlobMeta(doc_id: Long, n_bytes: Int, first_byte: Int,
      fake_width: Int, fake_height: Int, content_md5: String)

  object MultimodalStub {
    /** Deterministic fake of an image-header decode. A real decoder would
      * parse `data` here (e.g. JPEG SOF markers → width/height). */
    def decodeStub(b: DocBlob): BlobMeta = {
      val n = b.data.length
      val md = java.security.MessageDigest.getInstance("MD5").digest(b.data)
        .map("%02x".format(_)).mkString
      BlobMeta(b.doc_id, n, b.data(0) & 0xff, 64 + n % 512, 64 + (n * 7) % 512, md)
    }

    /** The real decode hook — intentionally unimplemented in this
      * container (no image libs); kept to mark the integration point. */
    def decodeImageReal(data: Array[Byte]): (Int, Int) =
      throw new NotImplementedError("image decoding not available in this environment")
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
