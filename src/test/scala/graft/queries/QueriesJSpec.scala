package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.multimodal.MediaPipeline

/** Structural invariants of the QueriesJ pack on the real testdata. */
class QueriesJSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q61 frame sample: frame count per doc matches the stub codec's n_frames/5") {
    val rows = SparkEntry.queries("q61_frame_sample")(spark, dir).collect()
    assert(rows.nonEmpty)
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    perDoc.foreach { case (id, frames) =>
      val nFrames = 1 + (id % 24).toInt
      assert(frames.length == (nFrames + 4) / 5) // ceil(n/5) sampled at stride 5
      assert(frames.map(_.getAs[Int]("frame_idx")).sorted.toSeq ==
        (0 until nFrames by 5).toSeq)
      val (w, h, _) = MediaPipeline.decodeStub(id, Array.emptyByteArray)
      assert(frames.forall(f => f.getAs[Int]("width") == w && f.getAs[Int]("height") == h))
    }
    // frame 0 is the unrotated payload: checksum equals the document checksum
    val doc0 = rows.filter(r => r.getAs[Long]("doc_id") == 0L && r.getAs[Int]("frame_idx") == 0)
    val meta0 = SparkEntry.queries("q60_multimodal_meta")(spark, dir)
      .filter("doc_id = 0").collect()
    assert(doc0.head.getAs[Long]("frame_checksum") == meta0.head.getAs[Long]("checksum"))
  }

  test("q62 resize: fits 256 box, preserves aspect within rounding, only shrinks") {
    val rows = SparkEntry.queries("q62_resize_dims")(spark, dir).collect()
    rows.foreach { r =>
      val (w, h, w2, h2) = (r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Int]("w2"), r.getAs[Int]("h2"))
      assert(w2 >= 1 && h2 >= 1 && w2 <= 256 + 0 && h2 <= 256)
      assert(w2 <= w && h2 <= h)
      if (r.getAs[Boolean]("resized")) {
        // aspect preserved within 1px rounding on the short side
        val expected = MediaPipeline.resizeDims(w, h, 256)
        assert((w2, h2) == expected)
        assert(math.max(w2, h2) == 256)
      } else assert((w2, h2) == ((w, h)))
    }
  }

  test("q46 quantization: mse bounded by the per-vector worst-case step size") {
    val rows = SparkEntry.queries("q46_quantize_int8")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mse = r.getAs[Double]("mse9")
      assert(mse >= 0)
      // quantization error per dim <= (step/2)^2 with step = maxabs/127;
      // embeddings are bounded (|x| <= ~8 comfortably): loose global cap
      assert(mse <= 64 * math.pow(8.0 / 127 / 2, 2))
    }
  }

  test("q74 interval join: bucket equi-join path equals a naive inequality join") {
    val out = SparkEntry.queries("q74_stream_join")(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_pairs"))).toMap
    val ev = graft.Tables.t(spark, dir, "events")
      .selectExpr("user_id", "event_type", "ts DIV 1000000 AS ts_ms").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val clicks = ev.filter(_._2 == "click")
    val purchases = ev.filter(_._2 == "purchase")
    val naive = (for {
      (u, _, tc) <- clicks
      (u2, _, tp) <- purchases
      if u == u2 && tp >= tc && tp - tc <= 600000L
    } yield u).groupBy(identity).map { case (u, xs) => u -> xs.length.toLong }
    assert(out == naive)
  }
}
