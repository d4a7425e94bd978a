package graft

import graft.operators.Sq8

/** SQ8 scalar quantization: distortion obeys uniform-quantizer physics
  * and byte precision preserves the exact top-3 on this corpus. */
class Sq8Spec extends SparkSpec {

  test("distortion is uniform-quantizer noise: mse tracks range^2 / (256^2 * 12)") {
    val rows = rowsOf(Sq8.queries("ann_sq8_distortion")(spark, sfDir()))
    assert(rows.size == Sq8.Dim / Sq8.DimGroup)
    rows.foreach { r =>
      val mse = r("mse").asInstanceOf[Double]
      val rng = r("avg_range").asInstanceOf[Double]
      val theory = rng * rng / (65536.0 * 12.0)
      // round(6) quantizes tiny values; bound from both sides loosely
      assert(mse <= theory * 4 + 1e-6, s"group ${r("dim_group")}: $mse vs $theory")
      assert(r("n_vals").asInstanceOf[Long] > 0)
    }
  }

  test("byte precision keeps exact recall on this corpus (the PQ contrast)") {
    val rows = rowsOf(Sq8.queries("ann_recall_sq8")(spark, sfDir()))
    assert(rows.nonEmpty)
    val mean = rows.map(_("recall").asInstanceOf[Double]).sum / rows.size
    assert(mean == 1.0, s"SQ8 ADC recall $mean — byte noise flipped a top-3")
  }
}
