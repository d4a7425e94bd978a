package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.OpModule

/** Bar/candle analytics re-expressing the reference's resample + volatility
  * estimators (SURVEY.md §2.5) over the `events` table, hourly buckets:
  *
  *  - OHLC resample       (data_manager.py:788-801, aether_oracle.py:205-217)
  *  - ATR% with <N-bar realized-vol fallback (data_manager.py:774-833)
  *  - realized volatility (data_manager.py:747-772)
  *  - EMA span=20, adjust=False, bounded 3*span lookback
  *    (data_manager.py:721-745)
  *
  * The reference recomputes each estimator by rescanning a Python deque per
  * tick; here each is one declarative pass: a hash aggregation (partial
  * map-side combine for free) into per-bucket bars, then ordered window
  * frames over the bar table. The bar table is ~len(stream)/3600 rows, so
  * the `Window.orderBy` single-partition stage is tiny even at 100 TB of
  * raw events; multi-symbol data would `partitionBy(symbol)` every window.
  *
  * EMA is the one frame Spark lacks natively (SURVEY §2.6): we fold
  * `ema = a*x + (1-a)*ema` over an ordered `collect_list` frame with
  * `aggregate`, seeded with the frame's first element — the exact
  * `ewm(adjust=False)` recursion, bounded to the reference's 3*span-tick
  * lookback so state stays O(span) at any scale. The DuckDB oracle uses
  * `list_reduce` over the identical frame: both engines fold left in frame
  * order with the same double constants, so results match bitwise.
  */
object Bars extends OpModule {
  import Flow.HourUs

  val Span = 20
  val Lookback: Int = 3 * Span // reference: last 3*span ticks
  val AtrN = 10                // reference ATR window (config.py:82)
  val RvN = 30
  // Annualize-to-bucket factor; the reference scales realized vol by
  // sqrt(ticks_per_min) (data_manager.py:768) — fixed equivalent constant.
  val RvScale = "sqrt(60.0)"

  private[graft] def ohlcDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .events(spark, dir)
      .groupBy(expr(s"ts_us div $HourUs").as("bucket"))
      .agg(
        min_by($"value", $"event_id").as("open"),
        max($"value").as("high"),
        min($"value").as("low"),
        max_by($"value", $"event_id").as("close"),
        sum($"value").as("volume"),
        count(lit(1)).as("n_ticks"))
  }

  private[operators] val ohlcSql: String =
    s"""SELECT epoch_us(ts) // $HourUs AS bucket,
       |  arg_min(value, event_id) AS open, max(value) AS high,
       |  min(value) AS low, arg_max(value, event_id) AS close,
       |  sum(value) AS volume, count(*) AS n_ticks
       |FROM events GROUP BY 1""".stripMargin

  /** Micros per day, for the anchored-VWAP session boundary. */
  val DayUs: Long = 24L * HourUs

  /** Hourly + day-anchored VWAP (`bars_vwap`): the volume-weighted
    * average price per bar, and the session-anchored running VWAP every
    * execution desk charts (anchor = UTC day open). Size comes from the
    * payload's `k` field (the same extraction as `json_extract_agg`).
    * Determinism is the exact-cents canon: per-tick price·size
    * accumulates as `round(value*100)::BIGINT * k` — an
    * order-independent integer sum on both engines — and only the final
    * division produces a double, from identical operands. The anchored
    * window is a per-day running integer sum: one shuffle keyed by day,
    * no global ordering. */
  private def vwapDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"day").orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .withColumn("pv_cents", round($"value" * 100).cast("long") * $"k")
      .groupBy(expr(s"ts_us div $HourUs").as("bucket"))
      .agg(sum($"pv_cents").as("pv"), sum($"k").as("sz"),
        count(lit(1)).as("n_ticks"))
      .withColumn("day", expr(s"bucket div ${DayUs / HourUs}"))
      .withColumn("vwap",
        when($"sz" > 0, $"pv" / $"sz" / 100.0))
      .withColumn("avwap",
        when(sum($"sz").over(w) > 0,
          sum($"pv").over(w) / sum($"sz").over(w) / 100.0))
      .select($"bucket", $"n_ticks", $"sz".as("size_sum"),
        $"vwap", $"avwap")
  }

  private val vwapSql: String =
    s"""WITH t AS (
       |  SELECT epoch_us(ts) // $HourUs AS bucket,
       |    round(value * 100)::BIGINT *
       |      json_extract_string(props, '$$.k')::BIGINT AS pv_cents,
       |    json_extract_string(props, '$$.k')::BIGINT AS k
       |  FROM events),
       |b AS (
       |  SELECT bucket, sum(pv_cents)::BIGINT AS pv, sum(k)::BIGINT AS sz,
       |    count(*) AS n_ticks, bucket // ${DayUs / HourUs} AS day
       |  FROM t GROUP BY 1)
       |SELECT bucket, n_ticks, sz AS size_sum,
       |  CASE WHEN sz > 0 THEN pv / sz / 100.0 END AS vwap,
       |  CASE WHEN (sum(sz) OVER w)::BIGINT > 0
       |       THEN (sum(pv) OVER w)::BIGINT / (sum(sz) OVER w)::BIGINT / 100.0
       |  END AS avwap
       |FROM b
       |WINDOW w AS (PARTITION BY day ORDER BY bucket
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** True range + prev-close lag inputs shared by ATR and realized vol.
    * tr is explicitly NULL on the first bar (no prev close) — both engines'
    * `greatest` skip NULLs, so we guard rather than rely on that. */
  private def withTr(df: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"bucket")
    df.withColumn("pc", lag($"close", 1).over(w))
      .withColumn(
        "tr",
        when(
          $"pc".isNotNull,
          greatest($"high" - $"low", abs($"high" - $"pc"), abs($"low" - $"pc"))))
      .withColumn(
        "ret",
        when($"pc".isNotNull && $"pc" =!= 0.0, ($"close" - $"pc") / $"pc"))
  }

  private val trSql: String =
    s"""WITH ohlc AS ($ohlcSql),
       |b AS (SELECT *, lag(close) OVER (ORDER BY bucket) AS pc FROM ohlc),
       |t AS (SELECT *,
       |  CASE WHEN pc IS NOT NULL
       |       THEN greatest(high - low, abs(high - pc), abs(low - pc)) END AS tr,
       |  CASE WHEN pc IS NOT NULL AND pc <> 0.0
       |       THEN (close - pc) / pc END AS ret
       |  FROM b)""".stripMargin

  private def barsDf(spark: SparkSession, dir: String): DataFrame =
    ohlcDf(spark, dir)
      .select("bucket", "open", "high", "low", "close", "volume", "n_ticks")

  private val barsSql: String =
    s"""WITH ohlc AS ($ohlcSql)
       |SELECT bucket, open, high, low, close, volume, n_ticks FROM ohlc""".stripMargin

  /** ATR% = mean(last 10 TRs)/close once 10 TRs exist; before that, the
    * reference falls back to realized vol (data_manager.py:798-799,833). */
  private[operators] def atrDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wAtr = Window.orderBy($"bucket").rowsBetween(-(AtrN - 1), 0)
    val wRv = Window.orderBy($"bucket").rowsBetween(-(RvN - 1), 0)
    withTr(ohlcDf(spark, dir), spark)
      .withColumn("n_tr", count($"tr").over(wAtr))
      .withColumn("rv", stddev_pop($"ret").over(wRv) * expr(RvScale))
      .withColumn(
        "atr_pct",
        when($"n_tr" >= AtrN, avg($"tr").over(wAtr) / $"close").otherwise($"rv"))
      .select("bucket", "close", "tr", "atr_pct")
  }

  private[operators] val atrSql: String =
    s"""$trSql
       |SELECT bucket, close, tr,
       |  CASE WHEN count(tr) OVER wa >= $AtrN
       |       THEN (avg(tr) OVER wa) / close
       |       ELSE stddev_pop(ret) OVER wr * $RvScale END AS atr_pct
       |FROM t
       |WINDOW wa AS (ORDER BY bucket ROWS BETWEEN ${AtrN - 1} PRECEDING AND CURRENT ROW),
       |       wr AS (ORDER BY bucket ROWS BETWEEN ${RvN - 1} PRECEDING AND CURRENT ROW)""".stripMargin

  /** Rolling realized volatility of close-to-close returns. */
  private def rvDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"bucket").rowsBetween(-(RvN - 1), 0)
    withTr(ohlcDf(spark, dir), spark)
      .withColumn("rv", stddev_pop($"ret").over(w) * expr(RvScale))
      .select("bucket", "close", "ret", "rv")
  }

  private val rvSql: String =
    s"""$trSql
       |SELECT bucket, close, ret,
       |  stddev_pop(ret) OVER wr * $RvScale AS rv
       |FROM t
       |WINDOW wr AS (ORDER BY bucket ROWS BETWEEN ${RvN - 1} PRECEDING AND CURRENT ROW)""".stripMargin

  // alpha/one-minus-alpha written as the same double expressions on both
  // sides so the IEEE ops (one division, one subtraction) agree bitwise.
  private val alpha: Double = 2.0 / (Span + 1.0)
  private val omAlpha: Double = 1.0 - 2.0 / (Span + 1.0)

  /** EMA(span=20, adjust=False) over closes, bounded to the trailing
    * 3*span bars: fold seeded with the frame's first element. */
  private[operators] def emaDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wf = Window.orderBy($"bucket").rowsBetween(-(Lookback - 1), 0)
    ohlcDf(spark, dir)
      .withColumn("arr", collect_list($"close").over(wf))
      .withColumn(
        "ema",
        aggregate(
          slice($"arr", 2, Lookback - 1),
          element_at($"arr", 1),
          (acc, x) => lit(alpha) * x + lit(omAlpha) * acc))
      .select("bucket", "close", "ema")
  }

  private[operators] val emaSql: String =
    s"""WITH ohlc AS ($ohlcSql)
       |SELECT bucket, close,
       |  list_reduce(list(close) OVER wf,
       |              (acc, x) -> (2.0 / ${Span + 1}.0) * x + (1.0 - 2.0 / ${Span + 1}.0) * acc) AS ema
       |FROM ohlc
       |WINDOW wf AS (ORDER BY bucket ROWS BETWEEN ${Lookback - 1} PRECEDING AND CURRENT ROW)""".stripMargin

  // Holt smoothing constants as EXACT binary fractions (0.25 = 2^-2,
  // 0.125 = 2^-3) so the literals parse to identical doubles everywhere
  // and 1-alpha / 1-beta are exact too.
  val HoltAlpha = 0.25
  val HoltBeta = 0.125

  /** Holt linear-trend double smoothing (`bars_holt`, Holt 1957) — the
    * forecasting rung above [[emaDf]]: a coupled (level, trend) fold
    * `l' = a*x + (1-a)*(l+b); b' = beta*(l'-l) + (1-beta)*b` with the
    * 1-step-ahead forecast `l+b` shipped per bar. Same bounded-frame fold
    * machinery as the EMA (ordered `collect_list` + `aggregate` over the
    * trailing [[Lookback]] bars, seeded [first, 0]); the accumulator is a
    * 2-element array because the recursion carries two coupled states.
    * The DuckDB oracle folds `list_reduce` over `[x, 0]` pairs — the
    * 2-arg reduce's first element IS the same seed — with the level
    * expression textually duplicated inside the trend update so both
    * engines execute the identical IEEE op sequence and match bitwise,
    * like the EMA. */
  private[operators] def holtDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wf = Window.orderBy($"bucket").rowsBetween(-(Lookback - 1), 0)
    ohlcDf(spark, dir)
      .withColumn("arr", collect_list($"close").over(wf))
      .withColumn("lb",
        aggregate(
          slice($"arr", 2, Lookback - 1),
          array(element_at($"arr", 1), lit(0.0)),
          (acc, x) => {
            val l = element_at(acc, 1)
            val b = element_at(acc, 2)
            val l2 = lit(HoltAlpha) * x + lit(1.0 - HoltAlpha) * (l + b)
            array(l2, lit(HoltBeta) * (l2 - l) + lit(1.0 - HoltBeta) * b)
          }))
      .select($"bucket", $"close",
        element_at($"lb", 1).as("level"),
        element_at($"lb", 2).as("trend"),
        (element_at($"lb", 1) + element_at($"lb", 2)).as("forecast_next"))
  }

  private[operators] val holtSql: String = {
    val l2 = "0.25 * e[1] + 0.75 * (acc[1] + acc[2])"
    s"""WITH ohlc AS ($ohlcSql),
       |f AS (
       |  SELECT bucket, close,
       |    list_reduce(
       |      list_transform(list(close) OVER wf, x -> [x, 0.0::DOUBLE]),
       |      (acc, e) -> [$l2,
       |                   0.125 * (($l2) - acc[1]) + 0.875 * acc[2]]) AS lb
       |  FROM ohlc
       |  WINDOW wf AS (ORDER BY bucket
       |                ROWS BETWEEN ${Lookback - 1} PRECEDING AND CURRENT ROW))
       |SELECT bucket, close, lb[1] AS level, lb[2] AS trend,
       |  lb[1] + lb[2] AS forecast_next
       |FROM f""".stripMargin
  }

  /** Underwater curve + running peak (`bars_drawdown`): drawdown from the
    * all-time-high close, the risk statistic every equity-curve monitor
    * (reference: daily P&L summaries, main.py telemetry) reads first.
    * Pure prefix-max window over the bar table — like every bars_* frame
    * the single-partition stage is over the bounded bucket DOMAIN, not the
    * tick stream (multi-symbol would partitionBy(symbol)). Exact integer
    * cents for the prefix max; the drawdown ratio ships as floor'd basis
    * points so both engines compute the identical (a*b)/c double pair and
    * truncate the same way — no round-boundary lottery on a ratio. */
  private def drawdownDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"bucket").rowsBetween(Window.unboundedPreceding, 0)
    ohlcDf(spark, dir)
      .select($"bucket", round($"close" * 100).cast("long").as("close_cents"))
      .withColumn("peak_cents", max($"close_cents").over(w))
      .withColumn("dd_bps",
        floor(($"peak_cents" - $"close_cents") * lit(10000.0) / $"peak_cents"))
      .select($"bucket", $"close_cents", $"peak_cents", $"dd_bps")
  }

  private val drawdownSql: String =
    s"""WITH ohlc AS ($ohlcSql),
       |c AS (SELECT bucket, round(close * 100)::BIGINT AS close_cents FROM ohlc)
       |SELECT bucket, close_cents,
       |  max(close_cents) OVER w AS peak_cents,
       |  floor((max(close_cents) OVER w - close_cents) * 10000.0 /
       |        (max(close_cents) OVER w))::BIGINT AS dd_bps
       |FROM c
       |WINDOW w AS (ORDER BY bucket
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bars_ohlc" -> (barsDf(_, _)),
    "bars_vwap" -> (vwapDf(_, _)),
    "bars_atr" -> (atrDf(_, _)),
    "bars_rv" -> (rvDf(_, _)),
    "bars_ema" -> (emaDf(_, _)),
    "bars_drawdown" -> (drawdownDf(_, _)),
    "bars_holt" -> (holtDf(_, _))
  )

  val oracles: Map[String, String] = Map(
    "bars_ohlc" -> barsSql,
    "bars_vwap" -> vwapSql,
    "bars_atr" -> atrSql,
    "bars_rv" -> rvSql,
    "bars_ema" -> emaSql,
    "bars_drawdown" -> drawdownSql,
    "bars_holt" -> holtSql
  )
}
