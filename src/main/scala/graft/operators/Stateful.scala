package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.OpModule
import graft.state.Fsm
import graft.state.Fsm.{FsmIn, FsmEvent, TrendIn, CusumIn}
import graft.sources.Tables

/** Batch replay of the reference's stateful operators (SURVEY §2.9) plus
  * the result-table queries they feed (§2.2):
  *
  *  - `fsm_position_events`: the position engine — enter on fused signal,
  *    exit on bracket (SL before TP, pessimistic), score decay, or time
  *    stop, with a post-exit cooldown. The Spark side runs the pure
  *    `Fsm.step` over ts-sorted rows per key via `flatMapGroups`; the
  *    DuckDB oracle replays the *same* transition as a recursive CTE, so
  *    even the stateful path is hash-checked, not rows-only.
  *  - `fsm_daily_summary`: per-day aggregation of closed trades (count,
  *    wins/losses, win rate, pnl extremes, profit factor, avg hold) —
  *    the Daily Summary sink (zscore_excel_logger.py:345-420).
  *  - `fsm_cum_pnl`: running cumulative P&L over exits
  *    (zscore_excel_logger.py:330-343).
  *  - `trend_hysteresis`: k-confirmation trend flips over the EMA-derived
  *    raw trend (data_manager.py:1047-1067).
  *
  * Scale: state is O(1) per key and the fold is per-key sequential — the
  * same shape `flatMapGroupsWithState` gives the streaming path. The
  * single-symbol testdata means one group; real data keys by symbol and
  * every symbol folds in parallel.
  */
object Stateful extends OpModule {

  /** Per-bucket FSM input: bars + the side/total columns of the fusion
    * frame. */
  private def fsmInput(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Bars.ohlcDf(spark, dir)
      .select($"bucket", $"close", $"high", $"low")
      .join(
        Scores.scoredShared(spark, dir)
          .select($"bucket", $"side", $"total_long", $"total_short",
            ($"regime" === "HIGH").as("trail_arm")),
        Seq("bucket"))
      .withColumn("symbol", lit("SYM")) // single-symbol testdata (config.py:21)
  }

  private val fsmInputSql: String =
    s"""SELECT o.bucket, o.close, o.high, o.low,
       |       s.side, s.total_long, s.total_short,
       |       s.regime = 'HIGH' AS trail_arm, 'SYM' AS symbol
       |FROM (${Bars.ohlcSql}) o
       |JOIN (SELECT bucket, side, total_long, total_short, regime
       |      FROM (${Scores.scoredSql}) sq) s ON s.bucket = o.bucket""".stripMargin

  // three queries (events, daily summary, cum P&L) derive from the same
  // event stream: materialize it once per (session, dir)
  private def eventsDf(spark: SparkSession, dir: String): DataFrame =
    graft.functions.DfMemo.cached(spark, s"fsm_events:$dir") {
      import spark.implicits._
      fsmInput(spark, dir)
        .as[FsmIn]
        .groupByKey(_.symbol) // one state entry per symbol, folded in parallel
        // sorted-group fold: the shuffle's sort (spill-capable) orders each
        // symbol's history, so the fold streams — the group is never
        // materialized in memory, at any history length
        .flatMapSortedGroups(col("bucket"))((_: String, it: Iterator[FsmIn]) =>
          Fsm.run(it))
        .toDF()
    }

  /** The same transition function as `Fsm.step`, unrolled into a recursive
    * CTE — PER SYMBOL: the seed emits one rn=0 state row per distinct
    * symbol, rows rank per symbol, and each iteration advances every
    * symbol's fold by one row (`PARTITION BY symbol` in the rank,
    * `i.symbol = f.symbol` in the recursive join) — the SQL mirror of the
    * engine's keyed `flatMapSortedGroups`/`flatMapGroupsWithState` folds.
    * State columns carry (pos_side, entry, tp, sl, cooldown); event
    * columns carry the emitted row. Two nested subqueries stage the
    * derived predicates (exit_reason, enter_now, exit_px) since SQL can't
    * reference a select-list alias in the same select.
    *
    * `inpSql` must expose: symbol, bucket, close, high, low, side,
    * total_long, total_short, trail_arm. Shared by the single-symbol
    * `fsm_position_events` oracle and the multi-symbol
    * `fsm_position_events_keyed` oracle ([[MultiSym]]). */
  private[operators] def fsmCteSql(inpSql: String): String = {
    import Fsm._
    s"""WITH RECURSIVE inp AS MATERIALIZED (
       |  SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY bucket) AS rn
       |  FROM ($inpSql) fsm_base),
       |fsm AS (
       |  SELECT symbol, 0::BIGINT AS rn,
       |    CAST(NULL AS VARCHAR) AS pos_side, CAST(NULL AS BIGINT) AS pentry_bucket,
       |    CAST(NULL AS DOUBLE) AS pentry_price, CAST(NULL AS DOUBLE) AS tp,
       |    CAST(NULL AS DOUBLE) AS sl, false AS trailed,
       |    (-4611686018427387904)::BIGINT AS cooldown_until,
       |    CAST(NULL AS BIGINT) AS bucket, CAST(NULL AS VARCHAR) AS action,
       |    CAST(NULL AS VARCHAR) AS side, CAST(NULL AS BIGINT) AS entry_bucket,
       |    CAST(NULL AS DOUBLE) AS entry_price, CAST(NULL AS DOUBLE) AS exit_price,
       |    CAST(NULL AS DOUBLE) AS pnl, CAST(NULL AS VARCHAR) AS reason
       |  FROM (SELECT DISTINCT symbol FROM inp) syms
       |  UNION ALL
       |  SELECT t.symbol, t.rn,
       |    CASE WHEN t.exit_reason IS NOT NULL THEN NULL
       |         WHEN t.pos_side0 IS NOT NULL THEN t.pos_side0
       |         WHEN t.enter_now THEN t.in_side END,
       |    CASE WHEN t.exit_reason IS NOT NULL THEN NULL
       |         WHEN t.pos_side0 IS NOT NULL THEN t.entry_bucket0
       |         WHEN t.enter_now THEN t.bucket END,
       |    CASE WHEN t.exit_reason IS NOT NULL THEN NULL
       |         WHEN t.pos_side0 IS NOT NULL THEN t.entry_price0
       |         WHEN t.enter_now THEN t.close END,
       |    CASE WHEN t.exit_reason IS NOT NULL THEN NULL
       |         WHEN t.pos_side0 IS NOT NULL THEN t.tp0
       |         WHEN t.enter_now AND t.in_side = 'LONG' THEN t.close * $TpPctLongSql
       |         WHEN t.enter_now THEN t.close * $TpPctShortSql END,
       |    CASE WHEN t.exit_reason IS NOT NULL THEN NULL
       |         WHEN t.pos_side0 IS NOT NULL THEN
       |           CASE WHEN t.trail_arm AND NOT t.trailed0 AND t.trail_fav
       |                THEN t.entry_price0 ELSE t.sl0 END
       |         WHEN t.enter_now AND t.in_side = 'LONG' THEN t.close * $SlPctLongSql
       |         WHEN t.enter_now THEN t.close * $SlPctShortSql END,
       |    CASE WHEN t.exit_reason IS NOT NULL THEN false
       |         WHEN t.pos_side0 IS NOT NULL THEN
       |           t.trailed0 OR (t.trail_arm AND t.trail_fav)
       |         ELSE false END,
       |    CASE WHEN t.exit_reason IS NOT NULL THEN t.bucket + $CooldownBuckets
       |         ELSE t.cooldown_until0 END,
       |    t.bucket,
       |    CASE WHEN t.exit_reason IS NOT NULL THEN 'EXIT'
       |         WHEN t.enter_now THEN 'ENTER' END,
       |    CASE WHEN t.exit_reason IS NOT NULL THEN t.pos_side0
       |         WHEN t.enter_now THEN t.in_side END,
       |    CASE WHEN t.exit_reason IS NOT NULL THEN t.entry_bucket0
       |         WHEN t.enter_now THEN t.bucket END,
       |    CASE WHEN t.exit_reason IS NOT NULL THEN t.entry_price0
       |         WHEN t.enter_now THEN t.close END,
       |    t.exit_px,
       |    CASE WHEN t.exit_reason IS NOT NULL
       |         THEN (t.exit_px - t.entry_price0) *
       |              (CASE WHEN t.pos_side0 = 'LONG' THEN 1.0 ELSE -1.0 END) END,
       |    t.exit_reason
       |  FROM (
       |    SELECT t0.*,
       |      CASE WHEN t0.exit_reason = 'SL_HIT' THEN t0.sl0
       |           WHEN t0.exit_reason = 'TP_HIT' THEN t0.tp0
       |           WHEN t0.exit_reason IS NOT NULL THEN t0.close END AS exit_px,
       |      ((t0.pos_side0 = 'LONG' AND t0.close >= t0.entry_price0 * ${1.0 + TrailTriggerPct})
       |       OR (t0.pos_side0 = 'SHORT' AND t0.close <= t0.entry_price0 * ${1.0 - TrailTriggerPct}))
       |        AS trail_fav
       |    FROM (
       |      SELECT i.symbol, i.rn, i.bucket, i.close, i.high, i.low,
       |        i.side AS in_side, i.total_long, i.total_short, i.trail_arm,
       |        f.pos_side AS pos_side0, f.pentry_bucket AS entry_bucket0,
       |        f.pentry_price AS entry_price0, f.tp AS tp0, f.sl AS sl0,
       |        f.trailed AS trailed0,
       |        f.cooldown_until AS cooldown_until0,
       |        CASE WHEN f.pos_side = 'LONG' AND i.low <= f.sl THEN 'SL_HIT'
       |             WHEN f.pos_side = 'LONG' AND i.high >= f.tp THEN 'TP_HIT'
       |             WHEN f.pos_side = 'SHORT' AND i.high >= f.sl THEN 'SL_HIT'
       |             WHEN f.pos_side = 'SHORT' AND i.low <= f.tp THEN 'TP_HIT'
       |             WHEN f.pos_side IS NOT NULL
       |                  AND i.bucket - f.pentry_bucket >= $DecayMinBuckets
       |                  AND (CASE WHEN f.pos_side = 'LONG' THEN i.total_long
       |                            ELSE i.total_short END) < $DecayGate
       |                  THEN 'SCORE_DECAY'
       |             WHEN f.pos_side IS NOT NULL
       |                  AND i.bucket - f.pentry_bucket >= $MaxHoldBuckets
       |                  THEN 'TIME_STOP' END AS exit_reason,
       |        (f.pos_side IS NULL AND i.bucket >= f.cooldown_until
       |         AND i.side <> 'NONE') AS enter_now
       |      FROM fsm f
       |      JOIN inp i ON i.symbol = f.symbol AND i.rn = f.rn + 1) t0) t)
       |SELECT bucket, action, side, entry_bucket, entry_price, exit_price,
       |       pnl, reason, symbol
       |FROM fsm WHERE action IS NOT NULL""".stripMargin
  }

  private[operators] val eventsSql: String = fsmCteSql(fsmInputSql)

  // bracket multipliers as SQL literals (1 +- pct), matching the Scala
  // doubles in Fsm.step exactly
  private def TpPctLongSql = "1.04"
  private def TpPctShortSql = "0.96"
  private def SlPctLongSql = "0.98"
  private def SlPctShortSql = "1.02"

  private def exits(spark: SparkSession, dir: String): DataFrame =
    eventsDf(spark, dir).filter(col("action") === "EXIT")

  /** Daily Summary sink semantics (per trading day = 24 hourly buckets).
    * Factored over any exit-event frame so the live refresh
    * ([[graft.app.Live.refreshDailySummary]]) emits the identical
    * 12-column schema the batch query is hash-checked against. */
  def dailySummaryOf(exits: DataFrame): DataFrame = {
    val spark = exits.sparkSession
    import spark.implicits._
    exits
      .groupBy(expr("bucket div 24").as("day"))
      .agg(
        count(lit(1)).as("n_trades"),
        sum(when($"pnl" > 0.0, 1L).otherwise(0L)).as("wins"),
        sum(when($"pnl" <= 0.0, 1L).otherwise(0L)).as("losses"),
        (sum(when($"pnl" > 0.0, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("win_rate"),
        sum($"pnl").as("total_pnl"),
        max($"pnl").as("max_pnl"),
        min($"pnl").as("min_pnl"),
        avg(when($"pnl" > 0.0, $"pnl")).as("avg_win"),
        avg(when($"pnl" <= 0.0, $"pnl")).as("avg_loss"),
        abs(avg(when($"pnl" > 0.0, $"pnl")) /
          when(avg(when($"pnl" <= 0.0, $"pnl")) =!= 0.0,
            avg(when($"pnl" <= 0.0, $"pnl")))).as("profit_factor"),
        avg(($"bucket" - $"entry_bucket").cast("double")).as("avg_hold"))
  }

  private def dailyDf(spark: SparkSession, dir: String): DataFrame =
    dailySummaryOf(exits(spark, dir))

  private val dailySql: String =
    s"""WITH ev AS ($eventsSql)
       |SELECT bucket // 24 AS day, count(*) AS n_trades,
       |  sum(CASE WHEN pnl > 0.0 THEN 1 ELSE 0 END)::BIGINT AS wins,
       |  sum(CASE WHEN pnl <= 0.0 THEN 1 ELSE 0 END)::BIGINT AS losses,
       |  sum(CASE WHEN pnl > 0.0 THEN 1 ELSE 0 END)::DOUBLE / count(*) AS win_rate,
       |  sum(pnl) AS total_pnl, max(pnl) AS max_pnl, min(pnl) AS min_pnl,
       |  avg(CASE WHEN pnl > 0.0 THEN pnl END) AS avg_win,
       |  avg(CASE WHEN pnl <= 0.0 THEN pnl END) AS avg_loss,
       |  abs(avg(CASE WHEN pnl > 0.0 THEN pnl END)
       |      / nullif(avg(CASE WHEN pnl <= 0.0 THEN pnl END), 0.0)) AS profit_factor,
       |  avg((bucket - entry_bucket)::DOUBLE) AS avg_hold
       |FROM ev WHERE action = 'EXIT' GROUP BY 1""".stripMargin

  /** Running cumulative P&L over closed trades (§2.5). */
  private def cumPnlDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    exits(spark, dir)
      .select($"bucket", $"side", $"pnl", $"reason")
      .withColumn("cum_pnl", sum($"pnl").over(w))
  }

  private val cumPnlSql: String =
    s"""WITH ev AS ($eventsSql)
       |SELECT bucket, side, pnl,
       |  reason,
       |  sum(pnl) OVER (ORDER BY bucket
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pnl
       |FROM ev WHERE action = 'EXIT'""".stripMargin

  // Raw trend band: +-2% around the EMA.
  private def trendDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Bars.emaDf(spark, dir)
      .withColumn("raw",
        when($"close" > $"ema" * 1.02, "UPTREND")
          .when($"close" < $"ema" * 0.98, "DOWNTREND")
          .otherwise("RANGEBOUND"))
      .select($"bucket", $"raw")
      .withColumn("symbol", lit("SYM"))
      .as[TrendIn]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("bucket"))((_: String, it: Iterator[TrendIn]) =>
        Fsm.trendRun(it))
      .toDF()
  }

  private val trendSql: String =
    s"""WITH RECURSIVE b AS MATERIALIZED (${Bars.emaSql}),
       |inp AS MATERIALIZED (SELECT bucket,
       |    CASE WHEN close > ema * 1.02 THEN 'UPTREND'
       |         WHEN close < ema * 0.98 THEN 'DOWNTREND'
       |         ELSE 'RANGEBOUND' END AS raw,
       |    row_number() OVER (ORDER BY bucket) AS rn
       |  FROM b),
       |t AS (
       |  SELECT 0::BIGINT AS rn, 'RANGEBOUND' AS confirmed,
       |    CAST(NULL AS VARCHAR) AS pending, 0 AS cnt,
       |    CAST(NULL AS BIGINT) AS bucket, CAST(NULL AS VARCHAR) AS raw
       |  UNION ALL
       |  SELECT i.rn,
       |    CASE WHEN i.raw = t.confirmed THEN t.confirmed
       |         WHEN t.pending = i.raw AND t.cnt + 1 >= ${Fsm.HysteresisK} THEN i.raw
       |         ELSE t.confirmed END,
       |    CASE WHEN i.raw = t.confirmed THEN NULL
       |         WHEN t.pending = i.raw AND t.cnt + 1 >= ${Fsm.HysteresisK} THEN NULL
       |         WHEN t.pending = i.raw THEN t.pending
       |         ELSE i.raw END,
       |    CASE WHEN i.raw = t.confirmed THEN 0
       |         WHEN t.pending = i.raw AND t.cnt + 1 >= ${Fsm.HysteresisK} THEN 0
       |         WHEN t.pending = i.raw THEN t.cnt + 1
       |         ELSE 1 END,
       |    i.bucket, i.raw
       |  FROM t JOIN inp i ON i.rn = t.rn + 1)
       |SELECT bucket, raw, confirmed, 'SYM' AS symbol
       |FROM t WHERE bucket IS NOT NULL""".stripMargin

  /** Confirmation counts for the hysteresis dial — k=1 and k=2 are the
    * reference's own HTF/LTF settings (data_manager.py:1047-1067,
    * 1155-1170); 3 and 4 extend the curve. */
  val HystCurveKs: Seq[Int] = Seq(1, 2, 3, 4)

  /** The hysteresis dial (`trend_hysteresis_curve`): the k-confirmation
    * trend FSM replayed at four confirmation counts, each summarized to
    * (flips, lagging buckets). Raising k trades whipsaw (flips fall)
    * for lag (confirmed diverges from raw longer) — the exact trade the
    * reference tunes between its HTF and LTF settings, priced on data.
    * Uniform semantics across k: a flip needs k CONSECUTIVE divergent
    * readings, so k=1 flips immediately (the HTF behavior). The k=2
    * column's flip count equals the shipped `trend_hysteresis` run's
    * (spec-asserted). */
  private def trendCurveDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val inp = Bars.emaDf(spark, dir)
      .withColumn("raw",
        when($"close" > $"ema" * 1.02, "UPTREND")
          .when($"close" < $"ema" * 0.98, "DOWNTREND")
          .otherwise("RANGEBOUND"))
      .select($"bucket", $"raw")
      .withColumn("symbol", lit("SYM"))
      .as[TrendIn]
    HystCurveKs.map { k =>
      val run = inp.groupByKey(_.symbol)
        .flatMapSortedGroups(col("bucket"))(
          (_: String, it: Iterator[TrendIn]) => Fsm.trendRunK(it, k))
        .toDF()
      val w = Window.partitionBy($"symbol").orderBy($"bucket")
      run.withColumn("prev", lag($"confirmed", 1).over(w))
        .agg(count(lit(1)).as("n_buckets"),
          sum(when($"prev".isNotNull && $"prev" =!= $"confirmed", 1L)
            .otherwise(0L)).as("n_flips"),
          sum(when($"confirmed" =!= $"raw", 1L).otherwise(0L))
            .as("n_lagging"))
        .select(lit(k.toLong).as("k"), $"n_buckets", $"n_flips",
          $"n_lagging")
    }.reduce(_ unionByName _)
  }

  private lazy val trendCurveSql: String =
    HystCurveKs.map { k =>
      s"""SELECT ${k}::BIGINT AS k, count(*) AS n_buckets,
         |  sum(CASE WHEN prev IS NOT NULL AND prev <> confirmed
         |      THEN 1 ELSE 0 END)::BIGINT AS n_flips,
         |  sum(CASE WHEN confirmed <> raw THEN 1 ELSE 0 END)::BIGINT
         |    AS n_lagging
         |FROM (
         |  SELECT confirmed, raw,
         |    lag(confirmed) OVER (ORDER BY rn) AS prev
         |  FROM (
         |    WITH RECURSIVE b AS MATERIALIZED (${Bars.emaSql}),
         |    inp AS MATERIALIZED (SELECT bucket,
         |        CASE WHEN close > ema * 1.02 THEN 'UPTREND'
         |             WHEN close < ema * 0.98 THEN 'DOWNTREND'
         |             ELSE 'RANGEBOUND' END AS raw,
         |        row_number() OVER (ORDER BY bucket) AS rn
         |      FROM b),
         |    t AS (
         |      SELECT 0::BIGINT AS rn, 'RANGEBOUND' AS confirmed,
         |        CAST(NULL AS VARCHAR) AS pending, 0 AS cnt,
         |        CAST(NULL AS BIGINT) AS bucket, CAST(NULL AS VARCHAR) AS raw
         |      UNION ALL
         |      SELECT i.rn,
         |        CASE WHEN i.raw = t.confirmed THEN t.confirmed
         |             WHEN t.pending = i.raw AND t.cnt + 1 >= $k THEN i.raw
         |             WHEN 1 >= $k THEN i.raw
         |             ELSE t.confirmed END,
         |        CASE WHEN i.raw = t.confirmed THEN NULL
         |             WHEN t.pending = i.raw AND t.cnt + 1 >= $k THEN NULL
         |             WHEN 1 >= $k THEN NULL
         |             WHEN t.pending = i.raw THEN t.pending
         |             ELSE i.raw END,
         |        CASE WHEN i.raw = t.confirmed THEN 0
         |             WHEN t.pending = i.raw AND t.cnt + 1 >= $k THEN 0
         |             WHEN 1 >= $k THEN 0
         |             WHEN t.pending = i.raw THEN t.cnt + 1
         |             ELSE 1 END,
         |        i.bucket, i.raw
         |      FROM t JOIN inp i ON i.rn = t.rn + 1)
         |    SELECT rn, confirmed, raw FROM t WHERE bucket IS NOT NULL))""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** First week of hourly buckets trains each key's CUSUM baseline. */
  val CusumTrainBuckets = 168

  /** Sequential drift detection (`flow_cusum`): two-sided CUSUM over the
    * hourly-mean value per event_type — the monitoring primitive that
    * catches a slow feed drift long before a fixed threshold fires
    * (reference main.py's health loop has only the threshold kind). The
    * baseline — target mean mu, allowance k = sigma/2 and decision
    * threshold h = 5*sigma in the classic CUSUM parameterization, with
    * sigma the TRAINING window's own bucket-mean dispersion so the dial
    * is unit-free — is learned from each key's first
    * [[CusumTrainBuckets]] buckets and BROADCAST
    * back, so the only shuffles are the grid aggregate and the keyed fold
    * — both on event_type, and the fold streams through
    * `flatMapSortedGroups` with O(1) state per key exactly like the
    * position FSM. All arithmetic is integer centi-cents (the bucket mean
    * floors once through a single exact double division), so the recursive
    * replay in DuckDB is bit-equal — the detector's every excursion and
    * reset is hash-checked, not just its alarms. */
  /** The hourly observation grid the detector folds over: per (key,
    * bucket) exact integer sums and the floored bucket mean x. */
  private[graft] def cusumGridDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type", expr(s"ts_us div ${Flow.HourUs}").as("bucket"))
      .agg(sum(round($"value" * 100).cast("long")).as("sum_cents"),
        count(lit(1)).as("n"))
      .withColumn("x", floor(($"sum_cents" * 100).cast("double") / $"n"))
  }

  /** Per-key baseline (mu, k, h) learned from the first
    * [[CusumTrainBuckets]] grid buckets — the standing state the
    * streaming twin ([[graft.streaming.Streams.cusumMonitor]]) ships in
    * its closure, exactly as a deployment would broadcast it.
    * Exact-integer sufficient statistics: n^2 * var = n*sum(x^2) -
    * sum(x)^2 stays a (cancelled, small) exact long, so sqrt sees the
    * identical double on both engines and the thresholds are
    * bit-stable. */
  private[graft] def cusumBaseDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    cusumGridDf(spark, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"event_type").orderBy($"bucket")))
      .filter($"rn" <= CusumTrainBuckets)
      .groupBy($"event_type")
      .agg(sum($"x").as("m"), sum($"x" * $"x").as("q"), count($"x").as("nn"))
      .withColumn("mu", floor($"m".cast("double") / $"nn"))
      .withColumn("num", $"q" * $"nn" - $"m" * $"m")
      .withColumn("k", floor(lit(0.5) * sqrt($"num".cast("double")) / $"nn"))
      .withColumn("h", floor(lit(5.0) * sqrt($"num".cast("double")) / $"nn"))
  }

  private def cusumDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    cusumGridDf(spark, dir)
      .join(broadcast(cusumBaseDf(spark, dir)), Seq("event_type"))
      .select($"event_type".as("etype"), $"bucket", $"x", $"mu", $"k", $"h")
      .as[CusumIn]
      .groupByKey(_.etype)
      .flatMapSortedGroups(col("bucket"))((_: String, it: Iterator[CusumIn]) =>
        Fsm.cusumRun(it))
      .toDF()
  }

  /** The grid CTEs shared by the cusum and seasonal oracles — the SQL
    * mirror of [[cusumGridDf]]. */
  private[operators] val cusumGridSql: String =
    s"""t0 AS MATERIALIZED (
       |  SELECT event_type, epoch_us(ts) // ${Flow.HourUs} AS bucket,
       |    sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents,
       |    count(*) AS n
       |  FROM events GROUP BY 1, 2),
       |g AS MATERIALIZED (
       |  SELECT event_type, bucket,
       |    floor((sum_cents * 100)::DOUBLE / n)::BIGINT AS x,
       |    row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS rn
       |  FROM t0)""".stripMargin

  private val cusumSql: String = {
    val sHi = "greatest(0::BIGINT, f.post_hi + i.x - i.mu - i.k)"
    val sLo = "greatest(0::BIGINT, f.post_lo + i.mu - i.x - i.k)"
    val alarm = s"($sHi > i.h OR $sLo > i.h)"
    s"""WITH RECURSIVE $cusumGridSql,
       |mu0 AS (
       |  SELECT event_type, sum(x)::BIGINT AS m, sum(x * x)::BIGINT AS q,
       |    count(x) AS nn
       |  FROM g WHERE rn <= $CusumTrainBuckets GROUP BY 1),
       |base AS MATERIALIZED (
       |  SELECT event_type, floor(m::DOUBLE / nn)::BIGINT AS mu,
       |    floor(0.5 * sqrt((q * nn - m * m)::DOUBLE) / nn)::BIGINT AS k,
       |    floor(5.0 * sqrt((q * nn - m * m)::DOUBLE) / nn)::BIGINT AS h
       |  FROM mu0),
       |c AS MATERIALIZED (
       |  SELECT g.event_type, g.bucket, g.rn, g.x, b.mu, b.k, b.h
       |  FROM g JOIN base b ON g.event_type = b.event_type),
       |f AS (
       |  SELECT event_type, 0::BIGINT AS rn, CAST(NULL AS BIGINT) AS bucket,
       |    CAST(NULL AS BIGINT) AS x, 0::BIGINT AS s_hi, 0::BIGINT AS s_lo,
       |    false AS alarm, 0::BIGINT AS post_hi, 0::BIGINT AS post_lo
       |  FROM (SELECT DISTINCT event_type FROM c) seed
       |  UNION ALL
       |  SELECT i.event_type, i.rn, i.bucket, i.x,
       |    $sHi, $sLo, $alarm,
       |    CASE WHEN $alarm THEN 0::BIGINT ELSE $sHi END,
       |    CASE WHEN $alarm THEN 0::BIGINT ELSE $sLo END
       |  FROM f JOIN c i ON i.event_type = f.event_type AND i.rn = f.rn + 1)
       |SELECT event_type, bucket, x AS x_centi, s_hi, s_lo, alarm
       |FROM f WHERE bucket IS NOT NULL""".stripMargin
  }

  /** Hour-of-day seasonal profile (`flow_seasonal`): the third leg of
    * the monitoring trio next to `flow_cusum` (level drift) and
    * `lm_autocorr` (serial dependence) — per event_type, what does a
    * normal hour h look like? One pass over the SAME hourly grid the
    * CUSUM folds (bucket % 24 is the UTC hour of day), per (key, hod)
    * exact integer mean and range. A monitor subtracts this profile
    * before alarming so the daily cycle doesn't page anyone; group
    * cardinality is |keys| x 24 regardless of volume. */
  private def seasonalDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    cusumGridDf(spark, dir)
      .groupBy($"event_type", ($"bucket" % 24).as("hod"))
      .agg(count(lit(1)).as("n_buckets"),
        floor(sum($"x").cast("double") / count($"x")).as("mean_centi"),
        (max($"x") - min($"x")).as("range_centi"))
  }

  private val seasonalSql: String =
    s"""WITH $cusumGridSql
       |SELECT event_type, bucket % 24 AS hod, count(*) AS n_buckets,
       |  floor(sum(x)::DOUBLE / count(x))::BIGINT AS mean_centi,
       |  (max(x) - min(x))::BIGINT AS range_centi
       |FROM g GROUP BY 1, 2""".stripMargin

  /** Seasonal-adjusted anomaly census (`events_anomaly`): the
    * composition the seasonal profile exists FOR — subtract each hour's
    * [[seasonalDf]] expectation from the grid, then flag buckets whose
    * residual exceeds 3 residual-sigmas. ENTIRELY integer arithmetic:
    * the 3σ cut is the cross-multiplied comparison
    * `resid² · n² > 9 · (n·Σr² − (Σr)²)` — the sums are exact int64 and
    * the comparison itself widens to decimal128 (both sides reach ~1e20
    * at ~1e4 buckets/key; see the filter comment), so there is not a
    * single double in the query — no sqrt, no division, nothing to
    * drift. The per-key stats
    * frame and the |keys|×24 profile both broadcast; the only shuffles
    * are the grid aggregate and the two key-count-sized reductions. */
  private def anomalyDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grid = cusumGridDf(spark, dir).select($"event_type", $"bucket", $"x")
    val prof = grid
      .groupBy($"event_type".as("p_type"), ($"bucket" % 24).as("hod"))
      .agg(floor(sum($"x").cast("double") / count($"x")).as("mean_centi"))
    val r = grid
      .join(broadcast(prof),
        $"p_type" === $"event_type" && $"hod" === $"bucket" % 24)
      .select($"event_type", $"bucket", $"x", $"mean_centi",
        ($"x" - $"mean_centi").as("resid"))
    val st = r.groupBy($"event_type")
      .agg(sum($"resid").as("m"), sum($"resid" * $"resid").as("q"),
        count(lit(1)).as("n"))
    // decimal128 for the cross-multiplied comparison: resid²·n² reaches
    // ~1e20 once a key holds ~1e4 buckets of ~1e6-centi residuals —
    // past int64, an ANSI runtime error. decimal(38,0) keeps the
    // arithmetic EXACT (both sides ≪ 1e38) with zero drift; DuckDB
    // mirrors it with HUGEINT.
    val dec = "decimal(38,0)"
    r.join(broadcast(st), Seq("event_type"))
      .filter(($"resid" * $"resid").cast(dec) * $"n" * $"n" >
        lit(9L).cast(dec) * ($"q".cast(dec) * $"n" - $"m".cast(dec) * $"m"))
      .select($"event_type", $"bucket", $"x", $"mean_centi", $"resid")
  }

  private val anomalySql: String =
    s"""WITH $cusumGridSql,
       |prof AS (
       |  SELECT event_type, bucket % 24 AS hod,
       |    floor(sum(x)::DOUBLE / count(x))::BIGINT AS mean_centi
       |  FROM g GROUP BY 1, 2),
       |r AS (
       |  SELECT g.event_type, g.bucket, g.x, p.mean_centi,
       |    g.x - p.mean_centi AS resid
       |  FROM g JOIN prof p
       |    ON p.event_type = g.event_type AND p.hod = g.bucket % 24),
       |st AS (
       |  SELECT event_type, sum(resid)::BIGINT AS m,
       |    sum(resid * resid)::BIGINT AS q, count(*) AS n
       |  FROM r GROUP BY 1)
       |SELECT r.event_type, bucket, x, mean_centi, resid
       |FROM r JOIN st ON st.event_type = r.event_type
       |WHERE resid::HUGEINT * resid * n * n
       |  > 9::HUGEINT * (q::HUGEINT * n - m::HUGEINT * m)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fsm_position_events" -> (eventsDf(_, _)),
    "fsm_daily_summary" -> (dailyDf(_, _)),
    "fsm_cum_pnl" -> (cumPnlDf(_, _)),
    "trend_hysteresis" -> (trendDf(_, _)),
    "trend_hysteresis_curve" -> (trendCurveDf(_, _)),
    "flow_cusum" -> (cusumDf(_, _)),
    "flow_seasonal" -> (seasonalDf(_, _)),
    "events_anomaly" -> (anomalyDf(_, _))
  )

  val oracles: Map[String, String] = Map(
    "fsm_position_events" -> eventsSql,
    "fsm_daily_summary" -> dailySql,
    "fsm_cum_pnl" -> cumPnlSql,
    "trend_hysteresis" -> trendSql,
    "trend_hysteresis_curve" -> trendCurveSql,
    "flow_cusum" -> cusumSql,
    "flow_seasonal" -> seasonalSql,
    "events_anomaly" -> anomalySql
  )
}
