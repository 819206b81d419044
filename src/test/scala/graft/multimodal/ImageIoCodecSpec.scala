package graft.multimodal

import graft.SparkSpec
import MediaPipeline._

/** Real-decode path on REAL bytes: PNG/BMP payloads generated with
  * javax.imageio in-test, pushed through the same batch API the stub
  * profile uses (q60–q63/q154 stay on StubCodec for oracle parity). */
class ImageIoCodecSpec extends SparkSpec {

  private def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("ImageIoCodec decodes real PNG and BMP dimensions") {
    assert(ImageIoCodec.decode(1L, imageBytes(40, 25, "png")) == Some((40, 25, 1)))
    assert(ImageIoCodec.decode(2L, imageBytes(7, 300, "bmp")) == Some((7, 300, 1)))
  }

  test("ImageIoCodec quarantines garbage and truncated payloads") {
    assert(ImageIoCodec.decode(1L, Array[Byte](1, 2, 3, 4)) == None)
    assert(ImageIoCodec.decode(2L, imageBytes(40, 25, "png").take(20)) == None)
    assert(ImageIoCodec.decode(3L, Array.empty[Byte]) == None)
  }

  test("extractFeatures with ImageIoCodec: real dims out, rejects dropped") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "a", imageBytes(64, 48, "png")),
      MediaRow(2L, "a", imageBytes(10, 10, "bmp")),
      MediaRow(3L, "b", Array[Byte](9, 9, 9)), // undecodable → quarantine
      MediaRow(4L, "b", null)                  // null payload → quarantine
    ).toDS()
    val out = extractFeatures(rows, ImageIoCodec).collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == Seq(1L, 2L))
    assert(out(0).width == 64 && out(0).height == 48 && out(0).n_frames == 1)
    assert(out(1).width == 10 && out(1).height == 10)
    // PNG magic: 89 50 4E 47
    assert(out(0).magic_hex == "89504E47")
  }

  test("stub profile is untouched by the codec parameter default") {
    import spark.implicits._
    val rows = Seq(MediaRow(5L, "a", Array[Byte](1, 2, 3))).toDS()
    val out = extractFeatures(rows).collect()
    assert(out.head.width == 16 + ((5 * 37) % 1008)) // stub arithmetic
  }

  test("resizePayload: real pixels, aspect-preserving, re-decodable") {
    val big = imageBytes(200, 100, "png")
    val Some(outBytes) = resizePayload(big, 50)
    val dims = ImageIoCodec.decode(0L, outBytes)
    assert(dims == Some((50, 25, 1))) // matches resizeDims(200,100,50)
    // small images pass through at original size
    val small = imageBytes(30, 20, "png")
    val Some(out2) = resizePayload(small, 50)
    assert(ImageIoCodec.decode(0L, out2) == Some((30, 20, 1)))
    assert(resizePayload(Array[Byte](1, 2), 50) == None)
  }
}
