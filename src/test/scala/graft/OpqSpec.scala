package graft

import org.apache.spark.sql.functions._

/** OPQ balanced-layout rung (operators/Opq.scala): the serpentine
  * variance-balanced subspace assignment and its measured payoff over
  * the natural contiguous split on the anisotropic corpus. */
class OpqSpec extends SparkSpec {
  import graft.operators.Opq

  private lazy val assign =
    Opq.queries("ann_opq_assign")(spark, sfDir()).cache()
  private lazy val dist =
    Opq.queries("ann_opq_distortion")(spark, sfDir())
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap

  test("serpentine assignment is balanced: 8 dims per subspace, one per variance octile") {
    import spark.implicits._
    val perSub = assign.groupBy($"s_bal").count().collect()
    assert(perSub.length === Opq.Sub)
    assert(perSub.forall(_.getLong(1) === Opq.SubDim))
    // snake draft: each subspace draws exactly one dim from each octile
    // of the variance rank, which is what balances the sums
    val octiles = assign
      .select($"s_bal", expr(s"int((vrank - 1) div ${Opq.SubDim})").as("oct"))
      .groupBy($"s_bal", $"oct").count().collect()
    assert(octiles.length === Opq.Sub * Opq.SubDim)
    assert(octiles.forall(_.getLong(2) === 1L))
  }

  test("natural layout concentrates variance; balanced layout levels it") {
    val (natRatio, _) = dist("natural")
    val (balRatio, _) = dist("balanced")
    // dims scale 4x in variance per natural block -> contiguous split's
    // subspace sums span ~4^7; the snake draft must land near 1
    assert(natRatio > 100.0, s"natural var_ratio $natRatio not concentrated")
    assert(balRatio < 2.0, s"balanced var_ratio $balRatio not balanced")
  }

  test("balanced layout cuts quantization MSE on the anisotropic corpus") {
    val (_, natMse) = dist("natural")
    val (_, balMse) = dist("balanced")
    assert(balMse < natMse,
      s"balanced MSE $balMse not below natural $natMse")
    // the rung exists because the gap is large, not marginal
    // (measured 4.6x at sf0.001/sf0.01)
    assert(balMse * 2 < natMse,
      s"balanced MSE $balMse not at least 2x below natural $natMse")
  }
}
