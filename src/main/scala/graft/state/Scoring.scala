package graft.state

import graft.operators.{Book, Scores}

/** The reference's full scoring cascade as pure scalar math — the
  * incremental twin of [[graft.operators.Scores.scored]]'s Column
  * cascade (strategy.py:139-328, aether_oracle.py:255-493), written
  * with the SAME operation order and double literals so the two
  * implementations agree to the last ulp on identical inputs.
  * ScoringSpec feeds one's inputs to the other and asserts equality;
  * that spec is the drift guard that lets the live fold
  * ([[Fusion.step]]) claim the batch cascade's semantics.
  *
  * Also holds the incremental estimators the fold needs that the batch
  * side computes with window frames: trailing-ring Hurst (the
  * reference's trailing-20 rescan, aether_oracle.py:155-186), ATR%
  * with realized-vol fallback (data_manager.py:774-833), bar-ring BOS
  * (aether_oracle.py:188-250, single-TF at the stream's bar grain),
  * and the order-book scalars (imbalance / wall / touch,
  * strategy.py:939-998,1046-1068) over the per-bar top-k level arrays.
  */
object Scoring {

  // -- scalar kernels: same op order as ColFns' Column twins --
  // StrictMath, not math.*: Spark's Exp/Log expressions evaluate via
  // StrictMath, while HotSpot's Math.exp intrinsic may differ by 1 ulp —
  // ScoringSpec's bitwise-equality guard caught exactly that.

  /** A&S 7.1.26 erf approximation — identical to ColFns.normCdf. */
  def normCdf(x: Double): Double = {
    val y = x / math.sqrt(2.0)
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(y))
    val poly = t * (0.254829592 +
      t * (-0.284496736 +
        t * (1.421413741 +
          t * (-1.453152027 + t * 1.061405429))))
    val erfAbs = 1.0 - poly * StrictMath.exp(-(y * y))
    val erf = if (x >= 0) erfAbs else -erfAbs
    0.5 * (1.0 + erf)
  }

  def sigmoid(x: Double): Double = 1.0 / (1.0 + StrictMath.exp(-x))

  /** least(greatest(x, lo), hi) — ColFns.clamp's order. */
  def clamp(x: Double, lo: Double, hi: Double): Double =
    math.min(math.max(x, lo), hi)

  /** squash(v, t) = Φ((v − t)/(t/2)) — Scores' signal normalizer. */
  def squash(v: Double, t: Double): Double = normCdf((v - t) / (t / 2.0))

  // -- the cascade --

  /** Per-bar signal inputs, Option where the batch column is nullable. */
  case class SignalIn(close: Double, atrPct: Option[Double],
      z: Option[Double], cvd: Double, imbalance: Option[Double],
      bidWall: Option[Double], askWall: Option[Double],
      bidTouchOk: Boolean, askTouchOk: Boolean, lv: Option[Double],
      bos: Option[Double], hurst: Option[Double])

  case class ScoreOut(regime: String, coreLong: Double, coreShort: Double,
      fusedLong: Double, fusedShort: Double, kellyLong: Double,
      kellyShort: Double, winprobLong: Double, winprobShort: Double,
      totalLong: Double, totalShort: Double, side: String)

  /** The exact cascade of [[graft.operators.Scores.scored]]: regime ->
    * gates -> core (5 squashed components) -> MC/Bayes/RL -> fused ->
    * Kelly + win-prob -> totals -> entry side. Null semantics mirror the
    * Column version: coalesce-to-0 inputs, null-skipping greatest, RL
    * present only with Hurst. */
  def score(in: SignalIn): ScoreOut = {
    val z0 = in.z.getOrElse(0.0)
    val cvd0 = in.cvd
    val imb0 = in.imbalance.getOrElse(0.0)
    val bos0 = in.bos.getOrElse(0.0)
    val bw0 = in.bidWall.getOrElse(0.0)
    val aw0 = in.askWall.getOrElse(0.0)
    val touchL = if (in.bidTouchOk) 1.0 else 0.0
    val touchS = if (in.askTouchOk) 1.0 else 0.0

    val regime = in.atrPct match {
      case Some(a) if a < Scores.AtrLow => "LOW"
      case Some(a) if a > Scores.AtrHigh => "HIGH"
      case _ => "NEUTRAL"
    }
    val zGate = regime match {
      case "HIGH" => Scores.ZGate + Scores.ZShift
      case "LOW" => Scores.ZGate - Scores.ZShift
      case _ => Scores.ZGate
    }
    val wallGate =
      if (regime == "HIGH") Scores.WallGateHigh else Scores.WallGate
    val sigmaMc = math.max(in.atrPct.getOrElse(1.0) / 10.0, 0.0001)

    def core(zS: Double, wallC: Double, imbS: Double, touchC: Double) =
      0.25 * squash(imbS, Scores.ImbGate) +
        0.20 * squash(wallC, wallGate) +
        0.30 * squash(zS, zGate) +
        0.10 * touchC +
        0.15 * squash(bos0, 0.5)

    val coreLong = core(z0, bw0, imb0, touchL)
    val coreShort = core(-z0, aw0, -imb0, touchS)
    val mcLong = normCdf(cvd0 / sigmaMc)
    val mcShort = normCdf(-cvd0 / sigmaMc)
    // greatest(hurst - 0.5, 0.0): null-skipping greatest -> 0.0 sans hurst
    val hTerm = in.hurst.map(h => math.max(h - 0.5, 0.0)).getOrElse(0.0)
    val bayesLong = sigmoid(2.5 * cvd0 + 1.5 * imb0 + bos0 + hTerm)
    val bayesShort = sigmoid(-2.5 * cvd0 - 1.5 * imb0 + bos0 + hTerm)
    val rl = in.hurst.map(h => clamp(0.5 + (0.5 - h), 0.01, 0.99))
    def fused(mc: Double, bayes: Double) = {
      val rlTerm = rl.map(0.3 * _).getOrElse(0.0)
      val wTot = if (rl.isDefined) 1.0 else 0.7
      (0.4 * mc + 0.3 * bayes + rlTerm) / wTot
    }
    val fusedLong = fused(mcLong, bayesLong)
    val fusedShort = fused(mcShort, bayesShort)
    def kelly(p: Double) =
      clamp((p * Scores.KellyB - (1.0 - p)) / Scores.KellyB,
        0.0, Scores.KellyCap)
    val lvTerm = 0.1 * math.min(in.lv.getOrElse(0.0) / 100.0, 1.0)
    val winprobLong =
      clamp(0.4 + 0.2 * z0 / 4.0 + 0.2 * cvd0 + 0.1 * bos0 + lvTerm, 0.0, 1.0)
    val winprobShort =
      clamp(0.4 - 0.2 * z0 / 4.0 - 0.2 * cvd0 + 0.1 * bos0 + lvTerm, 0.0, 1.0)
    val totalLong = 0.65 * coreLong + 0.35 * fusedLong
    val totalShort = 0.65 * coreShort + 0.35 * fusedShort
    val entryLong =
      totalLong > Scores.EntryTotal && winprobLong > Scores.EntryWinprob
    val entryShort =
      totalShort > Scores.EntryTotal && winprobShort > Scores.EntryWinprob
    val side =
      if (entryLong) "LONG" else if (entryShort) "SHORT" else "NONE"
    ScoreOut(regime, coreLong, coreShort, fusedLong, fusedShort,
      kelly(fusedLong), kelly(fusedShort), winprobLong, winprobShort,
      totalLong, totalShort, side)
  }

  // -- order-book scalars over per-bar top-k level arrays --

  case class BookSignals(imbalance: Option[Double], bidWall: Option[Double],
      askWall: Option[Double], bidTouchOk: Boolean, askTouchOk: Boolean)

  /** Imbalance / wall / touch from qty-desc-sorted top-[[Book.Depth]]
    * level arrays — the same formulas as [[graft.operators.Book]]'s
    * batch queries (mid = mean kept level, zone = mid ± 12%, touch vs
    * the rank-1 level in 0.1% ticks), evaluated per bar on the already
    * depth-capped arrays the windowed aggregation carries. */
  def bookSignals(bids: Seq[Double], asks: Seq[Double],
      close: Double): BookSignals = {
    val bidVol = bids.sum
    val askVol = asks.sum
    val tot = bidVol + askVol
    val imbalance = if (tot != 0.0) Some((bidVol - askVol) / tot) else None
    val nLevels = bids.length + asks.length
    val mid = if (nLevels > 0) (bidVol + askVol) / nLevels else 0.0
    val lo = mid * (1 - Book.ZonePct)
    val hi = mid * (1 + Book.ZonePct)
    def zone(side: Seq[Double]) = side.filter(v => v >= lo && v <= hi).sum
    val bidWall =
      if (bidVol != 0.0) Some(zone(bids) / (bidVol / Book.Depth)) else None
    val askWall =
      if (askVol != 0.0) Some(zone(asks) / (askVol / Book.Depth)) else None
    val tick = close * Book.TickPct
    def touchOk(best: Option[Double]) =
      tick != 0.0 && best.exists(b =>
        math.abs(close - b) / tick <= Book.TouchGateTicks)
    // arrays are qty-desc sorted: head IS the rank-1 level
    BookSignals(imbalance, bidWall, askWall,
      touchOk(bids.headOption), touchOk(asks.headOption))
  }

  // -- incremental estimators over trailing rings --

  /** Trailing-window rescaled-range Hurst (the reference's per-tick
    * trailing-20 rescan): demean, cumulative-sum the deviations,
    * H = log(R/S)/log(n). None below the full window or with a
    * degenerate series. */
  def hurst(closes: Vector[Double]): Option[Double] = {
    val n = closes.length
    if (n < graft.operators.LongMemory.HurstN) None
    else {
      val mu = closes.sum / n
      var acc = 0.0
      val cum = closes.map { c => acc += c - mu; acc }
      val r = cum.max - cum.min
      val cumMu = cum.sum / n
      val s = math.sqrt(cum.map(x => (x - cumMu) * (x - cumMu)).sum / n)
      if (r > 0.0 && s > 0.0)
        Some(StrictMath.log(r / s) / StrictMath.log(n.toDouble))
      else None
    }
  }

  /** ATR% = mean(trailing TRs)/close once the window is full; realized
    * vol stddev_pop(rets)·√60 before that; None with no returns yet. */
  def atrPct(trs: Vector[Double], rets: Vector[Double],
      close: Double): Option[Double] =
    if (trs.length >= graft.operators.Bars.AtrN)
      Some(trs.sum / trs.length / close)
    else if (rets.isEmpty) None
    else {
      val mu = rets.sum / rets.length
      Some(math.sqrt(
        rets.map(x => (x - mu) * (x - mu)).sum / rets.length) *
        math.sqrt(60.0))
    }

  /** Fraction of the trailing bars whose high/low the close escapes —
    * BOS at the stream's bar grain (the live single-TF reading; the
    * batch query averages three timeframes). None with no history. */
  def bos(prevBars: Vector[(Double, Double)], close: Double): Option[Double] =
    if (prevBars.isEmpty) None
    else Some(prevBars.count { case (h, l) =>
      close > h || close < l }.toDouble / prevBars.length)
}
