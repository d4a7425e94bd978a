package graft.state

/** Pure state machines for the reference's stateful operators
  * (SURVEY.md §2.9):
  *
  *  - position FSM (strategy.py:334-364 dispatch, :719-757 manage,
  *    :854-874 brackets, :876-933 exit, cooldown :360-363): one position
  *    at a time; enter on signal, exit on SL/TP bracket, score decay, or
  *    time stop; cooldown after every exit. Exit priority mirrors the
  *    reference: bracket first, then decay, then time stop.
  *  - trend hysteresis (data_manager.py:123-130, 1047-1067): a trend flip
  *    must be confirmed k consecutive times before it is accepted.
  *
  * Both are pure `(state, input) => (state, output)` functions so the
  * batch replay (`flatMapGroups` over ts-sorted rows) and the streaming
  * path (`flatMapGroupsWithState`) share one implementation — the FSM is a
  * function of (state, ordered events) exactly as SURVEY §7.4(3) requires.
  * State is O(1) per key; at scale the key is the symbol.
  */
object Fsm {

  // Bracket / hold parameters (reference: TP/SL price calc
  // strategy.py:606-617; time stop strategy.py:753; cooldown config.py:43;
  // decay exit strategy.py:743-747 with gate 0.50*0.65 ~ a third of the
  // score range — 0.25 in this engine's score units).
  val TpPct = 0.04
  val SlPct = 0.02
  val MaxHoldBuckets = 10L
  val DecayMinBuckets = 2L
  val DecayGate = 0.25
  val CooldownBuckets = 2L
  // Trailing stop (strategy.py:822-852): armed in the HIGH vol regime,
  // ratchets the SL to breakeven after a favorable 2% move, at most once.
  val TrailTriggerPct = 0.02

  // `symbol` rides along (defaulted for the single-symbol reference,
  // config.py:21) so the streaming FSMs key their state by the DATA's
  // symbol and the emitted events stay attributable per key — the
  // multi-symbol scale shape every scaladoc here promises.
  case class FsmIn(bucket: Long, close: Double, high: Double, low: Double,
      side: String, total_long: Double, total_short: Double,
      trail_arm: Boolean = false, symbol: String = "SYM")

  case class FsmEvent(bucket: Long, action: String, side: String,
      entry_bucket: Long, entry_price: Double, exit_price: Option[Double],
      pnl: Option[Double], reason: Option[String], symbol: String = "SYM")

  case class PosState(side: Option[String], entryBucket: Long,
      entryPrice: Double, tp: Double, sl: Double, cooldownUntil: Long,
      trailed: Boolean = false)

  val initState: PosState =
    PosState(None, 0L, 0.0, 0.0, 0.0, Long.MinValue, trailed = false)

  /** One transition. Emits at most one event per input row. */
  def step(st: PosState, i: FsmIn): (PosState, Option[FsmEvent]) =
    st.side match {
      case Some(side) =>
        val long = side == "LONG"
        val exitReason: Option[String] =
          if (long && i.low <= st.sl) Some("SL_HIT")
          else if (long && i.high >= st.tp) Some("TP_HIT")
          else if (!long && i.high >= st.sl) Some("SL_HIT")
          else if (!long && i.low <= st.tp) Some("TP_HIT")
          else if (i.bucket - st.entryBucket >= DecayMinBuckets &&
            (if (long) i.total_long else i.total_short) < DecayGate)
            Some("SCORE_DECAY")
          else if (i.bucket - st.entryBucket >= MaxHoldBuckets)
            Some("TIME_STOP")
          else None
        exitReason match {
          case Some(reason) =>
            val exitPx = reason match {
              case "SL_HIT" => st.sl
              case "TP_HIT" => st.tp
              case _ => i.close
            }
            val dir = if (long) 1.0 else -1.0
            val pnl = (exitPx - st.entryPrice) * dir
            (initState.copy(cooldownUntil = i.bucket + CooldownBuckets),
              Some(FsmEvent(i.bucket, "EXIT", side, st.entryBucket,
                st.entryPrice, Some(exitPx), Some(pnl), Some(reason),
                i.symbol)))
          case None =>
            // exit priority is bracket > decay > time (above); a held
            // position may then trail: SL ratchets to breakeven after a
            // favorable move, at most once (strategy.py:833,852)
            val favorable =
              if (long) i.close >= st.entryPrice * (1.0 + TrailTriggerPct)
              else i.close <= st.entryPrice * (1.0 - TrailTriggerPct)
            if (i.trail_arm && !st.trailed && favorable)
              (st.copy(sl = st.entryPrice, trailed = true), None)
            else (st, None)
        }
      case None =>
        if (i.bucket >= st.cooldownUntil && i.side != "NONE") {
          val long = i.side == "LONG"
          val tp = if (long) i.close * 1.04 else i.close * 0.96
          val sl = if (long) i.close * 0.98 else i.close * 1.02
          (PosState(Some(i.side), i.bucket, i.close, tp, sl, st.cooldownUntil,
            trailed = false),
            Some(FsmEvent(i.bucket, "ENTER", i.side, i.bucket, i.close,
              None, None, None, i.symbol)))
        } else (st, None)
    }

  /** Fold a ts-sorted iterator of inputs into the event stream. */
  def run(rows: Iterator[FsmIn]): Iterator[FsmEvent] = {
    var st = initState
    rows.flatMap { i =>
      val (st2, ev) = step(st, i)
      st = st2
      ev
    }
  }

  // ---- trend hysteresis ----

  val HysteresisK = 2 // LTF confirmation count (data_manager.py:1155-1170)

  case class TrendIn(bucket: Long, raw: String, symbol: String = "SYM")
  case class TrendOut(bucket: Long, raw: String, confirmed: String,
      symbol: String = "SYM")
  case class TrendState(confirmed: String, pending: Option[String], count: Int)

  val trendInit: TrendState = TrendState("RANGEBOUND", None, 0)

  /** A raw reading equal to the confirmed trend clears any pending flip;
    * a repeated new reading flips once seen k times in a row. The
    * confirmation count is the reference's own dial (HTF k=1, LTF k=2 —
    * data_manager.py:1047-1067, 1155-1170), so the step is parameterized
    * and [[trendStep]] pins the shipped [[HysteresisK]]. */
  def trendStepK(st: TrendState, raw: String, k: Int): TrendState =
    if (raw == st.confirmed) st.copy(pending = None, count = 0)
    else if (st.pending.contains(raw)) {
      if (st.count + 1 >= k) TrendState(raw, None, 0)
      else st.copy(count = st.count + 1)
    } else if (k <= 1) TrendState(raw, None, 0)
    else st.copy(pending = Some(raw), count = 1)

  def trendStep(st: TrendState, raw: String): TrendState =
    trendStepK(st, raw, HysteresisK)

  def trendRunK(rows: Iterator[TrendIn], k: Int): Iterator[TrendOut] = {
    var st = trendInit
    rows.map { i =>
      st = trendStepK(st, i.raw, k)
      TrendOut(i.bucket, i.raw, st.confirmed, i.symbol)
    }
  }

  def trendRun(rows: Iterator[TrendIn]): Iterator[TrendOut] =
    trendRunK(rows, HysteresisK)

  /** Per-key CUSUM input: hourly-mean observation `x` in integer
    * centi-cents plus the key's broadcast-learned baseline (target mean
    * `mu`, allowance `k`, decision threshold `h`, same units). */
  case class CusumIn(etype: String, bucket: Long, x: Long,
      mu: Long, k: Long, h: Long)
  case class CusumOut(event_type: String, bucket: Long, x_centi: Long,
      s_hi: Long, s_lo: Long, alarm: Boolean)

  /** Two-sided CUSUM (Page 1954) with reset-on-alarm, all integer
    * arithmetic: `s_hi` accumulates positive drift beyond the allowance
    * `k`, `s_lo` negative drift; either crossing `h` raises the alarm and
    * restarts both accumulators. Emitted s values are PRE-reset so the
    * alarm row shows the excursion that fired it. O(1) state per key —
    * the same fold shape as [[run]]/[[trendRun]], streamable via
    * `flatMapGroupsWithState`. */
  def cusumRun(rows: Iterator[CusumIn]): Iterator[CusumOut] = {
    var hi = 0L
    var lo = 0L
    rows.map { i =>
      val nHi = math.max(0L, hi + i.x - i.mu - i.k)
      val nLo = math.max(0L, lo + i.mu - i.x - i.k)
      val alarm = nHi > i.h || nLo > i.h
      hi = if (alarm) 0L else nHi
      lo = if (alarm) 0L else nLo
      CusumOut(i.etype, i.bucket, i.x, nHi, nLo, alarm)
    }
  }
}
