package graft

import org.apache.spark.sql.functions._

/** Multi-symbol end-to-end: the fused cascade + position FSM keyed by
  * symbol (operators/MultiSym.scala). The per-symbol recursive-CTE oracle
  * hash-checks values; these specs assert the STRUCTURAL keying claims —
  * each symbol folds independently, and the keyed result restricted to
  * one symbol equals a single-symbol run of the same pure FSM. */
class MultiSymSpec extends SparkSpec {

  private lazy val fused =
    SparkEntry.queries("fused_multi")(spark, sfDir("sf0.001")).cache()
  private lazy val events =
    SparkEntry.queries("fsm_position_events_keyed")(spark, sfDir("sf0.001"))
      .cache()

  test("fused cascade runs per symbol with every symbol present") {
    val syms = fused.select("symbol").distinct().collect().map(_.getString(0))
    assert(syms.toSet == Set("S0", "S1", "S2", "S3"))
    // per-symbol z populations are independent: the same bucket may carry
    // different z per symbol (a global window would force one value)
    val zByBucket = fused.filter(col("z").isNotNull)
      .groupBy("bucket").agg(countDistinct("z").as("nz"))
      .filter(col("nz") > 1).count()
    assert(zByBucket > 0, "expected per-symbol z to differ within a bucket")
  }

  test("keyed FSM events alternate ENTER/EXIT independently per symbol") {
    val bySym = events.collect()
      .groupBy(_.getAs[String]("symbol"))
      .view.mapValues(_.sortBy(_.getAs[Long]("bucket"))).toMap
    assert(bySym.size >= 2, "expected events on several symbols")
    bySym.foreach { case (sym, evs) =>
      evs.zipWithIndex.foreach { case (e, i) =>
        val expected = if (i % 2 == 0) "ENTER" else "EXIT"
        assert(e.getAs[String]("action") == expected,
          s"$sym event $i should be $expected")
      }
      // every EXIT points back at its own symbol's preceding ENTER
      evs.grouped(2).foreach {
        case Array(en, ex) =>
          assert(ex.getAs[Long]("entry_bucket") == en.getAs[Long]("bucket"))
          assert(ex.getAs[Double]("entry_price") ==
            en.getAs[Double]("entry_price"))
        case _ => () // trailing unmatched ENTER at end-of-data is fine
      }
    }
  }

  test("one symbol's slice through the keyed fold equals a single-symbol run") {
    import spark.implicits._
    import graft.state.Fsm
    // rebuild S1's FSM inputs from the fused frame and fold them alone
    val s1 = fused.filter($"symbol" === "S1")
      .select($"bucket", $"close", $"total_long", $"total_short", $"side")
      .collect().sortBy(_.getLong(0))
    // high/low are not in the public frame; the invariant checked here is
    // entry placement (close-driven), so replay with high=low=close and
    // compare ENTER events only — brackets need intrabar extremes
    val ins = s1.map(r => Fsm.FsmIn(r.getLong(0), r.getDouble(1),
      r.getDouble(1), r.getDouble(1), r.getString(4), r.getDouble(2),
      r.getDouble(3), trail_arm = false, symbol = "S1"))
    val replayEnters = Fsm.run(ins.iterator).filter(_.action == "ENTER")
      .map(e => e.bucket -> e.entry_price).toSeq.take(3)
    val keyedEnters = events.filter($"symbol" === "S1" && $"action" === "ENTER")
      .orderBy($"bucket").collect()
      .map(e => e.getAs[Long]("bucket") -> e.getAs[Double]("entry_price"))
      .toSeq.take(3)
    // first entry must coincide exactly (before bracket paths diverge on
    // the flattened high/low replay)
    assert(replayEnters.headOption == keyedEnters.headOption)
  }
}
