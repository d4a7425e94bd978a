package graft

import graft.state.Scoring
import graft.state.Scoring.SignalIn

/** The drift guard for the live fused cascade: [[graft.state.Scoring]]
  * (pure scalars, used by Fusion.step) must produce the SAME numbers as
  * [[graft.operators.Scores.scored]] (Column cascade, hash-checked
  * against the DuckDB oracle via fusion_scores/entry_signals). Identical
  * operation order + the one shared JVM make the match exact, so any
  * formula edit that touches only one side fails here.
  */
case class ScoringSigRow(bucket: Long, close: Double,
    atr_pct: Option[Double], z: Option[Double], cvd: Double,
    imbalance: Option[Double], bid_wall: Option[Double],
    ask_wall: Option[Double], bid_touch_ok: Boolean, ask_touch_ok: Boolean,
    lv_1h: Option[Double], bos: Option[Double], hurst: Option[Double])

class ScoringSpec extends SparkSpec {
  import graft.{ScoringSigRow => SigRow}

  private def randRows(n: Int, seed: Int): Seq[SigRow] = {
    val rnd = new scala.util.Random(seed)
    def opt[A](v: => A): Option[A] =
      if (rnd.nextDouble() < 0.15) None else Some(v)
    (0 until n).map { i =>
      SigRow(i.toLong, 50.0 + rnd.nextDouble() * 100.0,
        opt(rnd.nextDouble() * 12.0),            // spans LOW/NEUTRAL/HIGH
        opt(rnd.nextDouble() * 10.0 - 5.0),
        rnd.nextDouble() * 2.0 - 1.0,
        opt(rnd.nextDouble() * 2.0 - 1.0),
        opt(rnd.nextDouble() * 8.0),
        opt(rnd.nextDouble() * 8.0),
        rnd.nextBoolean(), rnd.nextBoolean(),
        opt(rnd.nextDouble() * 500.0),
        opt(rnd.nextDouble()),
        opt(rnd.nextDouble()))
    }
  }

  test("pure cascade equals the Column cascade bitwise on 500 random signal rows") {
    import spark.implicits._
    val rows = randRows(500, 42)
    val colOut = graft.operators.Scores
      .scored(rows.toDF(), spark)
      .collect()
      .map(r => r.getAs[Long]("bucket") -> r)
      .toMap
    rows.foreach { in =>
      val got = Scoring.score(SignalIn(in.close, in.atr_pct, in.z, in.cvd,
        in.imbalance, in.bid_wall, in.ask_wall, in.bid_touch_ok,
        in.ask_touch_ok, in.lv_1h, in.bos, in.hurst))
      val exp = colOut(in.bucket)
      def d(c: String) = exp.getAs[Double](c)
      assert(got.regime == exp.getAs[String]("regime"), s"regime @${in.bucket}")
      assert(got.coreLong == d("core_long"), s"core_long @${in.bucket}")
      assert(got.coreShort == d("core_short"), s"core_short @${in.bucket}")
      assert(got.fusedLong == d("fused_long"), s"fused_long @${in.bucket}")
      assert(got.fusedShort == d("fused_short"), s"fused_short @${in.bucket}")
      assert(got.kellyLong == d("kelly_long"), s"kelly_long @${in.bucket}")
      assert(got.kellyShort == d("kelly_short"), s"kelly_short @${in.bucket}")
      assert(got.winprobLong == d("winprob_long"), s"winprob_long @${in.bucket}")
      assert(got.winprobShort == d("winprob_short"), s"winprob_short @${in.bucket}")
      assert(got.totalLong == d("total_long"), s"total_long @${in.bucket}")
      assert(got.totalShort == d("total_short"), s"total_short @${in.bucket}")
      assert(got.side == exp.getAs[String]("side"), s"side @${in.bucket}")
    }
  }

  test("book trio from level arrays matches the batch formulas by hand") {
    // bids qty-desc: vol 300, asks: vol 150; 8 levels -> mid = 450/8
    val bids = Seq(100.0, 90.0, 60.0, 50.0)
    val asks = Seq(55.0, 45.0, 30.0, 20.0)
    val close = 99.95
    val bs = Scoring.bookSignals(bids, asks, close)
    assert(bs.imbalance.contains((300.0 - 150.0) / 450.0))
    val mid = 450.0 / 8
    val lo = mid * 0.88
    val hi = mid * 1.12
    val bidZone = bids.filter(v => v >= lo && v <= hi).sum
    val askZone = asks.filter(v => v >= lo && v <= hi).sum
    assert(bs.bidWall.contains(bidZone / (300.0 / graft.operators.Book.Depth)))
    assert(bs.askWall.contains(askZone / (150.0 / graft.operators.Book.Depth)))
    // touch: best bid 100 vs close 99.95: 0.05 / (0.09995) ticks ~ 0.5 <= 4
    assert(bs.bidTouchOk)
    // best ask 55: |99.95 - 55| / 0.09995 ~ 450 ticks > 4
    assert(!bs.askTouchOk)
    // no levels on a side -> None wall, closed touch, imbalance of the rest
    val one = Scoring.bookSignals(Seq(10.0), Nil, 10.0)
    assert(one.askWall.isEmpty && !one.askTouchOk && one.imbalance.contains(1.0))
    val none = Scoring.bookSignals(Nil, Nil, 10.0)
    assert(none.imbalance.isEmpty && none.bidWall.isEmpty && !none.bidTouchOk)
  }

  test("incremental estimators: hurst window/degeneracy, ATR fallback order, BOS fraction") {
    // hurst: below the 20-bar window or flat series -> None; a random
    // walk in (0.4, 0.7) -> defined and sane
    assert(Scoring.hurst(Vector.fill(19)(100.0)).isEmpty)
    assert(Scoring.hurst(Vector.fill(20)(100.0)).isEmpty) // degenerate
    val rnd = new scala.util.Random(7)
    val walk = Iterator.iterate(100.0)(_ + rnd.nextDouble() - 0.5)
      .take(20).toVector
    val h = Scoring.hurst(walk)
    assert(h.exists(v => v > 0.0 && v < 1.2), s"hurst $h")
    // ATR: no returns yet -> None; rv fallback below AtrN TRs; TR mean after
    assert(Scoring.atrPct(Vector.empty, Vector.empty, 100.0).isEmpty)
    val rets = Vector(0.01, -0.02, 0.03)
    val mu = rets.sum / 3
    val rv = math.sqrt(rets.map(x => (x - mu) * (x - mu)).sum / 3) *
      math.sqrt(60.0)
    assert(Scoring.atrPct(Vector(1.0, 2.0), rets, 100.0).contains(rv))
    val trs = Vector.tabulate(graft.operators.Bars.AtrN)(i => 1.0 + i)
    assert(Scoring.atrPct(trs, rets, 100.0)
      .contains(trs.sum / trs.length / 100.0))
    // BOS: close escapes 3 of 4 prior bars' ranges
    val bars = Vector((101.0, 99.0), (100.5, 99.5), (103.0, 98.0), (101.5, 99.2))
    assert(Scoring.bos(bars, 102.0).contains(3.0 / 4.0))
    assert(Scoring.bos(Vector.empty, 102.0).isEmpty)
  }
}
