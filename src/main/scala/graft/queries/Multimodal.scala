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
  final case class PatchPx(doc_id: Long, bucket: Int, px: Long, n_in: Long)
  final case class PatchFeat(doc_id: Long, bucket: Int, edge_energy: Long,
      n_edges: Long)

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

  /** q53c's resize kernel over an opaque blob: 1-D box pooling into
    * [[ResizeBuckets]] equal spans — bucket(i) = i·B div n, pooled
    * value = floor(mean) — all integer-exact, so the oracle replays it
    * in plain SQL. The per-blob loop is the decode-shape work a real
    * pixel resample does (one pass, O(1) state per bucket); the REAL
    * pixel form is [[resizeImageReal]], spec-exercised on generated
    * PNGs (the q53 stub-for-oracle / real-for-spec doctrine). */
  def resizePooled(blobs: org.apache.spark.sql.Dataset[DocBlob]): org.apache.spark.sql.Dataset[PatchPx] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap { b =>
      val n = b.data.length
      val sums = new Array[Long](ResizeBuckets)
      val cnts = new Array[Long](ResizeBuckets)
      var i = 0
      while (i < n) {
        val k = ((i.toLong * ResizeBuckets) / n).toInt
        sums(k) += (b.data(i) & 0xff); cnts(k) += 1; i += 1
      }
      (0 until ResizeBuckets).iterator.filter(cnts(_) > 0)
        .map(k => PatchPx(b.doc_id, k, sums(k) / cnts(k), cnts(k)))
    })
  }

  val ResizeBuckets = 16

  /** q53d's feature kernel: per-patch gradient energy — Σ|v[i+1]−v[i]|
    * over adjacent byte pairs, the pair assigned to the LEFT byte's
    * bucket — the classic edge-energy feature a vision pipeline
    * extracts per patch, integer-exact end to end. */
  def patchFeatures(blobs: org.apache.spark.sql.Dataset[DocBlob]): org.apache.spark.sql.Dataset[PatchFeat] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap { b =>
      val n = b.data.length
      val en = new Array[Long](ResizeBuckets)
      val ct = new Array[Long](ResizeBuckets)
      var i = 0
      while (i < n - 1) {
        val k = ((i.toLong * ResizeBuckets) / n).toInt
        en(k) += math.abs((b.data(i + 1) & 0xff) - (b.data(i) & 0xff))
        ct(k) += 1; i += 1
      }
      (0 until ResizeBuckets).iterator.filter(ct(_) > 0)
        .map(k => PatchFeat(b.doc_id, k, en(k), ct(k)))
    })
  }

  /** REAL image resize (spec-only, like [[MultimodalStub.decodeImageReal]]):
    * full ImageIO pixel decode + deterministic nearest-neighbor
    * resample to `ow`×`oh` gray levels — src pixel of dst (x,y) is
    * (x·w div ow, y·h div oh), gray = (r+g+b) div 3 — no AA, no float,
    * so the spec can replay it byte-for-byte in plain Scala. */
  def resizeImageReal(data: Array[Byte], ow: Int, oh: Int): Array[Int] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
    require(img != null, "no ImageIO reader recognizes these bytes")
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](ow * oh)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val rgb = img.getRGB(x * w / ow, y * h / oh)
        out(y * ow + x) =
          (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        x += 1
      }
      y += 1
    }
    out
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
        "WHERE off < length(text) ORDER BY doc_id, frame_idx")),

    QueryDef("q53c_multimodal_resize",
      // resize over an opaque binary (the brief's third multimodal op,
      // after decode and frame-sample): 1-D box pooling of the byte
      // signal into 16 equal spans — bucket = pos·16 div n, pooled px =
      // floor(mean) — the mapPartitions kernel shape a pixel resample
      // runs (one pass, O(1) state/bucket, decoder state amortized per
      // partition), with every step integer-exact so the oracle replays
      // it in SQL. The REAL pixel form (full ImageIO decode +
      // deterministic nearest-neighbor resample) is resizeImageReal,
      // exercised by MultimodalSpec on generated PNGs — the q53
      // stub-for-oracle / real-for-spec doctrine. Scale shape: per-row
      // map, no shuffle before the sort; output 16 rows per blob.
      (s, d) => {
        import s.implicits._
        resizePooled(Tables(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("data"))
          .as[DocBlob])
          .toDF().orderBy(col("doc_id"), col("bucket"))
      },
      Some("WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents), " +
        "ix AS (SELECT UNNEST(range(1, (SELECT MAX(n) + 1 FROM t))) AS i), " +
        "b AS (SELECT doc_id, CAST((i - 1) * 16 // n AS INT) AS bucket, " +
        "ascii(substring(text, i, 1)) AS v FROM t JOIN ix ON i <= n) " +
        "SELECT doc_id, bucket, CAST(SUM(v) // COUNT(*) AS BIGINT) AS px, " +
        "COUNT(*) AS n_in FROM b GROUP BY 1, 2 ORDER BY doc_id, bucket")),

    QueryDef("q53d_patch_features",
      // feature extraction over an opaque binary (the brief's fourth
      // multimodal op): per-patch gradient energy Σ|v[i+1]−v[i]| with
      // the pair assigned to the left byte's bucket — the edge-energy
      // feature a vision pipeline computes per patch before any model —
      // same one-pass integer kernel shape as q53c.
      (s, d) => {
        import s.implicits._
        patchFeatures(Tables(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("data"))
          .as[DocBlob])
          .toDF().orderBy(col("doc_id"), col("bucket"))
      },
      Some("WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents), " +
        "ix AS (SELECT UNNEST(range(1, (SELECT MAX(n) + 1 FROM t))) AS i), " +
        "b AS (SELECT doc_id, n, i - 1 AS pos, " +
        "ascii(substring(text, i, 1)) AS v FROM t JOIN ix ON i <= n), " +
        "e AS (SELECT doc_id, CAST(pos * 16 // n AS INT) AS bucket, " +
        "ABS(LEAD(v) OVER (PARTITION BY doc_id ORDER BY pos) - v) AS de " +
        "FROM b) " +
        "SELECT doc_id, bucket, CAST(SUM(de) AS BIGINT) AS edge_energy, " +
        "COUNT(*) AS n_edges FROM e WHERE de IS NOT NULL " +
        "GROUP BY 1, 2 ORDER BY doc_id, bucket")))
}
