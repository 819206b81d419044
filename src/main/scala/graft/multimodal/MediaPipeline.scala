package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoders}

/** Multimodal column plumbing (SURVEY.md §2F): image/audio/video travel as
  * opaque `binary` columns with typed metadata (reference analog: media
  * references, /root/reference/src/ubdc_airbnb/ubdc_airbnb/models.py:504
  * `picture_url` et al.). The Spark-side shape is real — typed rows,
  * partition-batched decode, stable output schema; ONLY the codec itself
  * is stubbed (no image/audio libs in this environment) with a
  * deterministic fake that any real decoder (javacv, thumbnailator, ...)
  * can replace behind the same signature.
  *
  * Scale shape: `mapPartitions` processes each partition as one batch —
  * the decoder amortizes per-partition init (model load, codec context)
  * exactly like `mapInPandas` batches do in PySpark.
  */
object MediaPipeline {

  /** An opaque media payload + envelope metadata. */
  final case class MediaRow(doc_id: Long, source: String, media: Array[Byte])

  /** Typed features extracted per media item. */
  final case class MediaFeatures(
      doc_id: Long, source: String, byte_len: Int, magic_hex: String,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** Pluggable codec: decode a payload to (width, height, n_frames) or
    * None when the bytes are undecodable (→ quarantine). Implementations
    * must be Serializable — they ship to executors inside the
    * mapPartitions closures. */
  trait MediaCodec extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): Option[(Int, Int, Int)]
  }

  /** STUB CODEC — deterministic fake decode. Derives plausible
    * dimensions from the id and never fails, so the plumbing is fully
    * testable and the DuckDB oracles can reproduce it arithmetically.
    * This is the ORACLE PROFILE; [[ImageIoCodec]] is the real one. */
  object StubCodec extends MediaCodec {
    def decode(id: Long, bytes: Array[Byte]): Option[(Int, Int, Int)] =
      Some(decodeStub(id, bytes))
  }

  /** REAL pure-JVM image decode via javax.imageio (PNG/BMP/GIF/JPEG ship
    * with the JDK — no external libs). Single-frame stills: n_frames=1.
    * Undecodable bytes → None (quarantine), matching the reference's
    * tolerance for dead picture_urls. */
  object ImageIoCodec extends MediaCodec {
    def decode(id: Long, bytes: Array[Byte]): Option[(Int, Int, Int)] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null) None else Some((img.getWidth, img.getHeight, 1))
      } catch { case _: Exception => None }
  }

  /** Deterministic fake decode (the [[StubCodec]] arithmetic). */
  def decodeStub(id: Long, bytes: Array[Byte]): (Int, Int, Int) = {
    val width = 16 + ((id * 37) % 1008).toInt
    val height = 16 + ((id * 53) % 752).toInt
    val nFrames = 1 + (id % 24).toInt
    (width, height, nFrames)
  }

  /** Real aspect-preserving pixel resize (decode → Graphics2D scale →
    * PNG re-encode) for payloads [[ImageIoCodec]] can read; None when
    * undecodable. The dimension math is [[resizeDims]] — the same
    * numbers the metadata-only planning stage (q62) reports. */
  def resizePayload(bytes: Array[Byte], maxSide: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w2, h2) = resizeDims(img.getWidth, img.getHeight, maxSide)
        val out = new java.awt.image.BufferedImage(
          w2, h2, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try g.drawImage(img, 0, 0, w2, h2, null) finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None }

  /** Rolling checksum over payload bytes (mod 1e9+7), matching
    * functions.TextFunctions.rollingFingerprint for ASCII payloads. */
  def checksum(bytes: Array[Byte]): Long =
    bytes.foldLeft(0L)((acc, b) => (acc * 131 + (b & 0xff)) % 1000000007L)

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02X").mkString

  /** Batch feature extraction: one decoder pass per partition. Null
    * payloads (failed fetch / corrupt blob — routine at ingest scale)
    * and payloads the codec rejects are quarantined: dropped here,
    * never half-decoded. Codec defaults to the deterministic
    * [[StubCodec]] (the oracle profile); pass [[ImageIoCodec]] for real
    * image bytes. */
  def extractFeatures(rows: Dataset[MediaRow],
                      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    rows.mapPartitions { it =>
      // per-partition decoder init would go here (codec context, model)
      it.filter(_.media != null).flatMap { r =>
        codec.decode(r.doc_id, r.media).map { case (w, h, f) =>
          MediaFeatures(r.doc_id, r.source, r.media.length,
            hex(r.media.take(4)), w, h, f, checksum(r.media))
        }
      }
    }
  }

  /** One sampled frame of a (stub-decoded) video payload. */
  final case class FrameRow(
      doc_id: Long, frame_idx: Int, width: Int, height: Int, frame_checksum: Long)

  /** Frame sampling: each payload expands to every `everyN`-th frame —
    * the fan-out stage of a video pipeline (1 row in, n_frames/everyN
    * out), expressed as a partition-batched flatMap so the decoder is
    * opened once per payload, not per frame. Frame bytes are stubbed as a
    * deterministic slice-rotation of the payload. */
  def sampleFrames(rows: Dataset[MediaRow], everyN: Int): Dataset[FrameRow] = {
    implicit val enc = Encoders.product[FrameRow]
    rows.mapPartitions { it =>
      it.filter(_.media != null).flatMap { r =>
        val (w, h, nFrames) = decodeStub(r.doc_id, r.media)
        (0 until nFrames by everyN).iterator.map { idx =>
          // stub frame content: payload rotated by the frame index
          val frame =
            if (r.media.isEmpty) r.media
            else r.media.drop(idx % r.media.length) ++ r.media.take(idx % r.media.length)
          FrameRow(r.doc_id, idx, w, h, checksum(frame))
        }
      }
    }
  }

  /** Resize metadata transform: pure dimension math (aspect-preserving
    * fit into maxSide), the shape every thumbnailing stage has; the pixel
    * work is the codec stub's concern. */
  def resizeDims(width: Int, height: Int, maxSide: Int): (Int, Int) = {
    val longSide = math.max(width, height)
    if (longSide <= maxSide) (width, height)
    else {
      // round-half-up keeps at least 1px
      val num = maxSide.toLong
      val w2 = math.max(1L, (width.toLong * num + longSide / 2) / longSide).toInt
      val h2 = math.max(1L, (height.toLong * num + longSide / 2) / longSide).toInt
      (w2, h2)
    }
  }

  /** Per-payload byte histogram (the feature-extraction stage: a real
    * pipeline would emit embedding/classifier features here; the byte
    * distribution is the deterministic stand-in with identical plumbing). */
  final case class HistRow(doc_id: Long, source: String, bins: Seq[Long])

  def byteHistogram(rows: Dataset[MediaRow], nBins: Int): Dataset[HistRow] = {
    implicit val enc = Encoders.product[HistRow]
    rows.mapPartitions { it =>
      // per-partition extractor init would go here
      it.filter(_.media != null).map { r =>
        val bins = new Array[Long](nBins)
        r.media.foreach(b => bins((b & 0xff) % nBins) += 1)
        HistRow(r.doc_id, r.source, bins.toSeq)
      }
    }
  }
}
