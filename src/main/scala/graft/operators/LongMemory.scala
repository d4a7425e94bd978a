package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.OpModule

/** Long-memory / structure estimators (SURVEY.md §2.5):
  *
  *  - Hurst exponent via rescaled range (aether_oracle.py:155-186): demean a
  *    20-sample series, cumulative-sum the deviations, H = log(R/S)/log(n)
  *    with R = max(cum)-min(cum), S = stddev_pop(cum).
  *  - Break-of-structure alignment (aether_oracle.py:188-250): fraction of
  *    the trailing 10 bars whose high/low the current close escapes,
  *    averaged across three timeframes (15m, 1h, 4h).
  *
  * The reference recomputes both on a Python list per tick. Here Hurst is a
  * pure window/group computation over *tumbling* 20-bar groups (the
  * reference's trailing-20 window, evaluated once per complete window): a
  * `row_number` assigns each bar to a group, the group mean demeans it, an
  * ordered running sum builds the cumulative-deviation series, and one
  * grouped aggregation finishes R, S and H — no per-row rescans, and every
  * stage is a hash aggregation or bounded window that survives arbitrary
  * scale (bars are already ~stream/3600 reduced; multi-symbol data adds
  * `partitionBy(symbol)`).
  *
  * BOS compares each bar's close against a *band* of preceding rows — a
  * range self-join on row number (each side ~720 rows at sf0.01), exactly
  * the interval-join family from SURVEY §2.4.
  */
object LongMemory extends OpModule {

  val HurstN = 20 // reference lookback (aether_oracle.py:162)
  val BosBars = 10 // reference last-10 bars (aether_oracle.py:227)

  private[operators] def hurstDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wOrd = Window.orderBy($"bucket")
    val wGrp = Window.partitionBy($"grp")
    val wCum = Window.partitionBy($"grp").orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Bars
      .ohlcDf(spark, dir)
      .withColumn("rn", row_number().over(wOrd) - 1)
      .withColumn("grp", expr(s"rn div $HurstN"))
      .withColumn("mu", avg($"close").over(wGrp))
      .withColumn("n", count(lit(1)).over(wGrp))
      .withColumn("cum", sum($"close" - $"mu").over(wCum))
      .groupBy($"grp")
      .agg(
        max($"n").as("n"),
        (max($"cum") - min($"cum")).as("r_range"),
        stddev_pop($"cum").as("s_dev"))
      .withColumn(
        "hurst",
        when(
          $"n" >= HurstN && $"r_range" > 0.0 && $"s_dev" > 0.0,
          log($"r_range" / $"s_dev") / log($"n".cast("double"))))
      .select("grp", "n", "r_range", "s_dev", "hurst")
  }

  private[operators] val hurstSql: String =
    s"""WITH ohlc AS (${Bars.ohlcSql}),
       |r AS (SELECT bucket, close,
       |        row_number() OVER (ORDER BY bucket) - 1 AS rn FROM ohlc),
       |g AS (SELECT *, rn // $HurstN AS grp FROM r),
       |m AS (SELECT *, avg(close) OVER (PARTITION BY grp) AS mu,
       |        count(*) OVER (PARTITION BY grp) AS n FROM g),
       |c AS (SELECT *, sum(close - mu) OVER (PARTITION BY grp ORDER BY bucket
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM m),
       |s AS (SELECT grp, max(n) AS n, max(cum) - min(cum) AS r_range,
       |        stddev_pop(cum) AS s_dev FROM c GROUP BY grp)
       |SELECT grp, n, r_range, s_dev,
       |  CASE WHEN n >= $HurstN AND r_range > 0.0 AND s_dev > 0.0
       |       THEN ln(r_range / s_dev) / ln(n::DOUBLE) END AS hurst
       |FROM s""".stripMargin

  /** Per-bar fraction of the previous 10 bars broken by the current close,
    * on 15m, 1h and 4h bars (the scale analog of the reference's
    * 1/5/15-minute triple, aether_oracle.py:222), averaged across the
    * timeframes that exist — exactly the reference's sum/valid_count
    * (aether_oracle.py:240-248). Reported at the hour grain; `bos_15m` is
    * the hour's latest quarter (the decision-time short-TF reading, same
    * convention as `flow_lv.lv_15m`). */
  private[operators] def bosDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bars1 = Bars.ohlcDf(spark, dir)
      .withColumn("rn", row_number().over(Window.orderBy($"bucket")))
      .select($"bucket", $"close", $"high", $"low", $"rn")
    val b = bars1.select($"bucket", $"close", $"rn".as("brn"))
    val p = bars1.select($"rn".as("prn"), $"high".as("phigh"), $"low".as("plow"))
    val bos1 = b
      .join(p, $"prn".between($"brn" - BosBars, $"brn" - 1))
      .groupBy($"bucket")
      .agg(avg(when($"close" > $"phigh" || $"close" < $"plow", 1.0)
        .otherwise(0.0)).as("bos_1h"))

    val bars15 = graft.sources.Tables.events(spark, dir)
      .groupBy(expr(s"ts_us div ${Flow.QuarterUs}").as("b15"))
      .agg(max($"value").as("high"), min($"value").as("low"),
        max_by($"value", $"event_id").as("close"))
      .withColumn("rn", row_number().over(Window.orderBy($"b15")))
    val b15 = bars15.select($"b15", $"close", $"rn".as("brn"))
    val p15 = bars15.select($"rn".as("prn"), $"high".as("phigh"), $"low".as("plow"))
    val bos15h = b15
      .join(p15, $"prn".between($"brn" - BosBars, $"brn" - 1))
      .groupBy($"b15")
      .agg(avg(when($"close" > $"phigh" || $"close" < $"plow", 1.0)
        .otherwise(0.0)).as("bos15"))
      .groupBy(expr("b15 div 4").as("b15h"))
      .agg(max_by($"bos15", $"b15").as("bos_15m"))

    val bars4 = Bars
      .ohlcDf(spark, dir)
      .groupBy(expr("bucket div 4").as("bucket4"))
      .agg(max($"high").as("high"), min($"low").as("low"),
        max_by($"close", $"bucket").as("close"))
      .withColumn("rn", row_number().over(Window.orderBy($"bucket4")))
    val b4 = bars4.select($"bucket4", $"close", $"rn".as("brn"))
    val p4 = bars4.select($"rn".as("prn"), $"high".as("phigh"), $"low".as("plow"))
    val bos4 = b4
      .join(p4, $"prn".between($"brn" - BosBars, $"brn" - 1))
      .groupBy($"bucket4")
      .agg(avg(when($"close" > $"phigh" || $"close" < $"plow", 1.0)
        .otherwise(0.0)).as("bos_4h"))

    bos1
      .join(bos15h, $"bucket" === $"b15h", "left")
      .join(bos4, expr("bucket div 4") === $"bucket4", "left")
      .withColumn("n_tf",
        lit(1) + $"bos_15m".isNotNull.cast("int") +
          $"bos_4h".isNotNull.cast("int"))
      .withColumn(
        "bos",
        (coalesce($"bos_15m", lit(0.0)) + $"bos_1h" +
          coalesce($"bos_4h", lit(0.0))) / $"n_tf")
      .select("bucket", "bos_15m", "bos_1h", "bos_4h", "bos")
  }

  private[operators] val bosSql: String =
    s"""WITH ohlc AS (${Bars.ohlcSql}),
       |r1 AS (SELECT bucket, close, high, low,
       |         row_number() OVER (ORDER BY bucket) AS rn FROM ohlc),
       |bos1 AS (
       |  SELECT b.bucket,
       |    avg(CASE WHEN b.close > p.high OR b.close < p.low
       |             THEN 1.0 ELSE 0.0 END) AS bos_1h
       |  FROM r1 b JOIN r1 p ON p.rn BETWEEN b.rn - $BosBars AND b.rn - 1
       |  GROUP BY b.bucket),
       |o15 AS (SELECT epoch_us(ts) // ${Flow.QuarterUs} AS b15,
       |         max(value) AS high, min(value) AS low,
       |         arg_max(value, event_id) AS close FROM events GROUP BY 1),
       |r15 AS (SELECT *, row_number() OVER (ORDER BY b15) AS rn FROM o15),
       |bos15 AS (
       |  SELECT b.b15,
       |    avg(CASE WHEN b.close > p.high OR b.close < p.low
       |             THEN 1.0 ELSE 0.0 END) AS bos15
       |  FROM r15 b JOIN r15 p ON p.rn BETWEEN b.rn - $BosBars AND b.rn - 1
       |  GROUP BY b.b15),
       |bos15h AS (SELECT b15 // 4 AS b15h, arg_max(bos15, b15) AS bos_15m
       |  FROM bos15 GROUP BY 1),
       |o4 AS (SELECT bucket // 4 AS bucket4, max(high) AS high, min(low) AS low,
       |         arg_max(close, bucket) AS close FROM ohlc GROUP BY 1),
       |r4 AS (SELECT *, row_number() OVER (ORDER BY bucket4) AS rn FROM o4),
       |bos4 AS (
       |  SELECT b.bucket4,
       |    avg(CASE WHEN b.close > p.high OR b.close < p.low
       |             THEN 1.0 ELSE 0.0 END) AS bos_4h
       |  FROM r4 b JOIN r4 p ON p.rn BETWEEN b.rn - $BosBars AND b.rn - 1
       |  GROUP BY b.bucket4)
       |SELECT bos1.bucket, bos15h.bos_15m, bos1.bos_1h, bos4.bos_4h,
       |  (coalesce(bos15h.bos_15m, 0.0) + bos1.bos_1h + coalesce(bos4.bos_4h, 0.0))
       |    / (1 + (bos15h.bos_15m IS NOT NULL)::INT + (bos4.bos_4h IS NOT NULL)::INT) AS bos
       |FROM bos1
       |LEFT JOIN bos15h ON bos1.bucket = bos15h.b15h
       |LEFT JOIN bos4 ON bos1.bucket // 4 = bos4.bucket4""".stripMargin

  /** ACF lags reported by [[acfDf]]: one trading day of hourly lags. */
  val AcfMaxLag = 24

  /** Autocorrelation function (`lm_autocorr`): lag-1..24 serial
    * correlation of the hourly close series — the direct long-memory
    * readout next to the rescaled-range [[hurstDf]] estimate (an AR(1)
    * market decays geometrically; long memory shows as a fat ACF tail).
    *
    * All sufficient statistics are EXACT integers so both engines derive
    * bit-identical ratios: with S = Σx and n over the full series, the
    * lag-k numerator is Σ (n·x_t − S)(n·x_{t+k} − S) — the mean-centered
    * cross-product scaled by n², computed entirely in int64 (cents keep
    * n·x ≤ 1e7, products ≤ 1e14, sums ≤ 1e17 < 2^63) — and the shared
    * denominator is the same sum at lag 0. The final acf double is one
    * division of two exactly-agreed integers. The lag dimension is a
    * broadcast 24-row frame joined against the bar-domain series, so the
    * whole query is bar-table-sized work regardless of raw event
    * volume. */
  private def acfDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = Bars.ohlcDf(spark, dir)
      .select($"bucket", round($"close" * 100).cast("long").as("x"))
    val stats = s.agg(sum($"x").as("s_sum"), count(lit(1)).as("n"))
    val den = s.crossJoin(broadcast(stats))
      .agg(sum(($"n" * $"x" - $"s_sum") * ($"n" * $"x" - $"s_sum")).as("den"))
    val lags = spark.range(1, AcfMaxLag + 1).select($"id".as("lag"))
    s.crossJoin(broadcast(lags))
      .join(s.select($"bucket".as("b2"), $"x".as("y")),
        $"b2" === $"bucket" + $"lag")
      .crossJoin(broadcast(stats))
      .groupBy($"lag")
      .agg(sum(($"n" * $"x" - $"s_sum") * ($"n" * $"y" - $"s_sum")).as("num"),
        count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(den))
      .select($"lag",
        ($"num".cast("double") / $"den".cast("double")).as("acf"),
        $"n_pairs")
  }

  private val acfSql: String =
    s"""WITH ohlc AS (${Bars.ohlcSql}),
       |s AS (SELECT bucket, round(close * 100)::BIGINT AS x FROM ohlc),
       |st AS (SELECT sum(x)::BIGINT AS s_sum, count(*) AS n FROM s),
       |den AS (SELECT sum((n * x - s_sum) * (n * x - s_sum))::BIGINT AS den
       |        FROM s, st),
       |p AS (
       |  SELECT l.lag, a.x, b.x AS y
       |  FROM s a CROSS JOIN range(1, ${AcfMaxLag + 1}) l(lag)
       |  JOIN s b ON b.bucket = a.bucket + l.lag)
       |SELECT lag,
       |  (sum((n * x - s_sum) * (n * y - s_sum))::BIGINT)::DOUBLE / den::DOUBLE
       |    AS acf,
       |  count(*) AS n_pairs
       |FROM p, st, den GROUP BY lag, den
       |""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lm_hurst" -> (hurstDf(_, _)),
    "lm_bos" -> (bosDf(_, _)),
    "lm_autocorr" -> (acfDf(_, _))
  )

  val oracles: Map[String, String] = Map(
    "lm_hurst" -> hurstSql,
    "lm_bos" -> bosSql,
    "lm_autocorr" -> acfSql
  )
}
