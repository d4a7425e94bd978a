package graft.state

import java.sql.Timestamp

/** The EP1 hot path as a pure fold: per finalized signal bar, every
  * trade-derived signal family (rolling z, normalized CVD, incremental
  * EMA, trend hysteresis, bar-grain liquidity velocity), the fused
  * long/short scores, the entry side, and the position FSM — in ONE
  * `(state, bar) => (state, out)` transition (reference per-tick loop:
  * strategy.py:334-443; fusion weights mirror `Scores`' formula shape).
  *
  * Pure like [[Fsm]], and for the same reason: the streaming path
  * (`Streams.fusedStream`, `flatMapGroupsWithState`) and the batch replay
  * (`Streams.fusedBatch`, `flatMapGroups`) share this single transition,
  * so live and replay CANNOT drift — the equivalence is asserted
  * end-to-end in StreamingSpec.
  *
  * Scale shape: inputs are already-aggregated per-(symbol, window) bars
  * — the shuffle carries one row per bar, never trades — and the state is
  * O(ring) per symbol (~24 KB), exactly the `flatMapGroupsWithState`
  * budget the rest of the engine uses.
  */
object Fusion {

  /** One finalized per-(symbol, window) signal bar: OHLC + taker flow. */
  case class SigBar(symbol: String, win_start: Timestamp, open: Double,
      high: Double, low: Double, close: Double, volume: Double,
      buy_vol: Double, sell_vol: Double)

  case class FusionState(ring: Vector[Double], ema: Option[Double],
      trend: Fsm.TrendState, pos: Fsm.PosState)

  /** The fused frame row + the FSM event it produced (if any), flattened
    * so one append-mode stream carries the whole decision. */
  case class FusedOut(symbol: String, win_start: Timestamp, close: Double,
      delta: Double, z: Option[Double], cvd: Double, ema: Double,
      trend: String, lv: Double, total_long: Double, total_short: Double,
      side: String, action: Option[String], pnl: Option[Double],
      reason: Option[String])

  val Span = 20         // EMA span (data_manager.py:721-745)
  val ZPop = 3000       // population ring (strategy.py:58)
  val ZMin = 30         // minimum population (strategy.py:1024)
  val ZGate = 2.1       // config.py:66
  val EntryGate = 0.55  // fused-score entry threshold (Scores' gate)

  def init: FusionState =
    FusionState(Vector.empty, None, Fsm.trendInit, Fsm.initState)

  private def clamp(x: Double, lo: Double, hi: Double): Double =
    math.max(lo, math.min(hi, x))

  def step(st: FusionState, b: SigBar): (FusionState, FusedOut) = {
    val delta = b.buy_vol - b.sell_vol
    val ring = (st.ring :+ delta).takeRight(ZPop)
    val n = ring.length
    val mu = ring.sum / n
    val sigma = math.sqrt(ring.map(x => (x - mu) * (x - mu)).sum / n)
    val z =
      if (n >= ZMin && sigma > 0) Some((delta - mu) / sigma) else None
    val tot = b.buy_vol + b.sell_vol
    val cvd = if (tot == 0.0) 0.0 else clamp(delta / tot, -1.0, 1.0)
    val alpha = 2.0 / (Span + 1.0)
    val ema = st.ema match {
      case Some(e) => alpha * b.close + (1.0 - alpha) * e
      case None => b.close
    }
    val raw =
      if (b.close > ema * 1.02) "UPTREND"
      else if (b.close < ema * 0.98) "DOWNTREND"
      else "RANGEBOUND"
    val trend = Fsm.trendStep(st.trend, raw)
    // bar-grain LV analog: volume per unit of realized price movement
    val lv = b.volume / (b.high - b.low + 1e-6)
    val z0 = z.map(v => clamp(v / 4.0, -1.0, 1.0)).getOrElse(0.0)
    val lvTerm = 0.1 * math.min(lv / 100.0, 1.0)
    val totalLong = 0.4 + 0.2 * z0 + 0.2 * cvd +
      0.1 * (if (trend.confirmed == "UPTREND") 1.0 else 0.0) + lvTerm
    val totalShort = 0.4 - 0.2 * z0 - 0.2 * cvd +
      0.1 * (if (trend.confirmed == "DOWNTREND") 1.0 else 0.0) + lvTerm
    val zSig = z match {
      case Some(v) if v >= ZGate => "LONG"
      case Some(v) if v <= -ZGate => "SHORT"
      case _ => "NONE"
    }
    val side =
      if (zSig == "LONG" && totalLong >= EntryGate) "LONG"
      else if (zSig == "SHORT" && totalShort >= EntryGate) "SHORT"
      else "NONE"
    val bucket = b.win_start.getTime / 60000L
    val (pos2, ev) = Fsm.step(st.pos,
      Fsm.FsmIn(bucket, b.close, b.high, b.low, side, totalLong, totalShort))
    val out = FusedOut(b.symbol, b.win_start, b.close, delta, z, cvd, ema,
      trend.confirmed, lv, totalLong, totalShort, side,
      ev.map(_.action), ev.flatMap(_.pnl), ev.flatMap(_.reason))
    (FusionState(ring, Some(ema), trend, pos2), out)
  }

  /** Fold a win_start-sorted iterator of bars into the fused stream. */
  def run(rows: Iterator[SigBar]): Iterator[FusedOut] = {
    var st = init
    rows.map { b =>
      val (st2, out) = step(st, b)
      st = st2
      out
    }
  }
}
