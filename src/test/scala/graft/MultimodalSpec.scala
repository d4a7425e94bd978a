package graft

import graft.operators.Multimodal

/** Multimodal plumbing: schema, frame sampling arithmetic, and the
  * partition-batched feature extraction (stubbed decode). */
class MultimodalSpec extends SparkSpec {

  test("media metadata: resize plan fits 512px and keeps aspect") {
    val rows = rowsOf(Multimodal.queries("media_meta")(spark, sfDir()))
    assert(rows.size == 500)
    rows.foreach { m =>
      val w = m("width").asInstanceOf[Long]
      val ow = m("out_width").asInstanceOf[Long]
      assert(ow <= 512 && ow <= w)
      if (w <= 512) assert(ow == w) // no upscale
      assert(Set("image", "audio", "video").contains(
        m("kind").asInstanceOf[String]))
      assert(m("n_bytes").asInstanceOf[Long] > 0)
    }
  }

  test("frame sampling keeps every 4th frame within bounds") {
    val rows = rowsOf(Multimodal.queries("media_frames")(spark, sfDir()))
    assert(rows.nonEmpty)
    rows.groupBy(_("media_id")).foreach { case (_, frames) =>
      val n = frames.head("n_frames").asInstanceOf[Long]
      val idxs = frames.map(_("frame_idx").asInstanceOf[Long]).sorted
      assert(idxs.head == 0L)
      assert(idxs.forall(i => i < n && i % Multimodal.FrameStride == 0))
      assert(idxs.size == ((n + Multimodal.FrameStride - 1) /
        Multimodal.FrameStride))
    }
  }

  test("feature extraction: normalized fixed-width histograms per row") {
    val rows = rowsOf(Multimodal.queries("media_features")(spark, sfDir()))
    assert(rows.size == 500)
    rows.foreach { m =>
      val f = (0 until Multimodal.FeatureBins)
        .map(i => m(s"f$i").asInstanceOf[Double])
      assert(math.abs(f.sum - 1.0) < 1e-9) // normalized over payload bytes
      assert(f.forall(v => v >= 0.0 && v <= 1.0))
    }
  }
}
