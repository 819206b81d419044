package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class MediaPipelineSpec extends SparkSpec {
  import MediaPipeline._

  test("extractFeatures runs the batch plumbing over binary payloads") {
    val s = spark
    import s.implicits._
    val rows = Seq((7L, "s1", "KEYWORD and more"), (8L, "s2", "xy"))
      .toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("media"))
      .as(Encoders.product[MediaRow])
    val out = extractFeatures(rows).collect().map(f => f.doc_id -> f).toMap

    val f7 = out(7L)
    assert(f7.byte_len == 16)
    assert(f7.magic_hex == "4B455957") // "KEYW"
    assert(f7.width == 16 + (7 * 37 % 1008) && f7.height == 16 + (7 * 53 % 752))
    assert(f7.n_frames == 1 + 7 % 24)
    assert(f7.checksum == "KEYWORD and more".foldLeft(0L)((a, c) => (a * 131 + c) % 1000000007L))
    // short payload: magic truncates, no crash
    assert(out(8L).magic_hex == "7879")
  }

  test("sampleFrames fans out every Nth frame with deterministic checksums") {
    val s = spark
    import s.implicits._
    val rows = Seq((23L, "s1", "some media payload bytes"))
      .toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("media"))
      .as(Encoders.product[MediaRow])
    val (_, _, nFrames) = decodeStub(23L, "some media payload bytes".getBytes)
    val frames = sampleFrames(rows, everyN = 3).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == (0 until nFrames by 3).toSeq)
    // re-running produces identical checksums (stub is deterministic)
    val again = sampleFrames(rows, everyN = 3).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_checksum).toSeq == again.map(_.frame_checksum).toSeq)
    // distinct frames have distinct content checksums
    assert(frames.map(_.frame_checksum).distinct.length == frames.length)
  }

  test("byteHistogram: bins sum to payload length, nulls quarantined") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, "s1", "abcabc!"), (2L, "s2", null))
      .toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("media"))
      .as(Encoders.product[MediaRow])
    val out = MediaPipeline.byteHistogram(rows, nBins = 16).collect()
    assert(out.length == 1, "null payload must be quarantined, not decoded")
    val h = out.head
    assert(h.bins.length == 16)
    assert(h.bins.sum == "abcabc!".length)
    // 'a'=97 → bin 1, 'b'=98 → bin 2, 'c'=99 → bin 3, '!'=33 → bin 1
    assert(h.bins(1) == 3 && h.bins(2) == 2 && h.bins(3) == 2)
  }

  test("resizeDims preserves aspect and never upscales") {
    assert(MediaPipeline.resizeDims(1000, 500, 200) == ((200, 100)))
    assert(MediaPipeline.resizeDims(500, 1000, 200) == ((100, 200)))
    assert(MediaPipeline.resizeDims(100, 50, 200) == ((100, 50))) // no upscale
    assert(MediaPipeline.resizeDims(10000, 3, 100) == ((100, 1)))  // floor to 1px
  }
}
