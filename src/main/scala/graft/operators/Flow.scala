package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Order-flow analytics re-expressing the reference's trade-stream operators
  * (SURVEY.md §2.5) over the `events` table (`value` = qty, `event_type`
  * polarity = `isBuyerMaker`, see FIXTURES.md §B):
  *
  *  - taker delta   (strategy.py:1000-1021)  — conditional sums per bucket
  *  - rolling z     (strategy.py:1022-1044)  — 3000-sample population stats
  *  - normalized CVD (aether_oracle.py:123-153)
  *  - liquidity velocity, multi-TF (aether_oracle.py:77-121)
  *  - volume-rate ratio (data_manager.py:1005-1035)
  *
  * The reference recomputes each signal by scanning its whole deque per tick
  * (O(window) per tick); here each is ONE declarative pass — a hash
  * aggregation plus (for z) a bounded row-frame window — so Catalyst gets
  * map-side partial aggregation and whole-stage codegen. At cluster scale the
  * `Window.orderBy` becomes `Window.partitionBy(symbol).orderBy(...)`; the
  * testdata is single-symbol like the reference (config.py:21).
  */
object Flow {
  import graft.sources.Tables.BuySql

  /** 10-minute delta buckets (reference uses 10 s on a ~100 Hz stream;
    * testdata is ~0.004 Hz so buckets scale accordingly — semantics equal). */
  val DeltaBucketUs: Long = 600L * 1000000L
  val HourUs: Long = 3600L * 1000000L

  private[operators] def deltaDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .eventsWithSide(spark, dir)
      .groupBy(expr(s"ts_us div $DeltaBucketUs").as("bucket"))
      .agg(
        sum(when($"is_buy", $"value").otherwise(0.0)).as("buy_vol"),
        sum(when(!$"is_buy", $"value").otherwise(0.0)).as("sell_vol"))
      .withColumn("delta", $"buy_vol" - $"sell_vol")
  }

  private[operators] val deltaSql: String =
    s"""SELECT epoch_us(ts) // $DeltaBucketUs AS bucket,
       |  sum(CASE WHEN $BuySql THEN value ELSE 0.0 END) AS buy_vol,
       |  sum(CASE WHEN $BuySql THEN 0.0 ELSE value END) AS sell_vol,
       |  sum(CASE WHEN $BuySql THEN value ELSE 0.0 END)
       |    - sum(CASE WHEN $BuySql THEN 0.0 ELSE value END) AS delta
       |FROM events GROUP BY 1""".stripMargin

  /** Rolling population z-score of the delta over the trailing 3000 buckets,
    * ddof=0, minimum population 30 (strategy.py:1024-1035); |z| >= 2.1 gates
    * the entry signal (config.py:66). */
  private[operators] def zscoreDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Single logical symbol => global ordering, mirroring the reference's one
    // population deque. Multi-symbol data would partitionBy(symbol) here.
    val w = Window.orderBy($"bucket").rowsBetween(-2999, 0)
    deltaDf(spark, dir)
      .withColumn("mu", avg($"delta").over(w))
      .withColumn("sigma", stddev_pop($"delta").over(w))
      .withColumn("n_pop", count(lit(1)).over(w))
      .withColumn(
        "z",
        when($"n_pop" >= 30 && $"sigma" > 0, ($"delta" - $"mu") / $"sigma"))
      .withColumn(
        "signal",
        when($"z" >= 2.1, "LONG").when($"z" <= -2.1, "SHORT").otherwise("NONE"))
      .select("bucket", "delta", "mu", "sigma", "z", "signal")
  }

  private[operators] val zscoreSql: String =
    s"""WITH d AS ($deltaSql)
       |SELECT bucket, delta,
       |  avg(delta) OVER w AS mu,
       |  stddev_pop(delta) OVER w AS sigma,
       |  CASE WHEN count(*) OVER w >= 30 AND stddev_pop(delta) OVER w > 0
       |       THEN (delta - avg(delta) OVER w) / (stddev_pop(delta) OVER w)
       |  END AS z,
       |  CASE WHEN count(*) OVER w >= 30 AND stddev_pop(delta) OVER w > 0
       |            AND (delta - avg(delta) OVER w) / (stddev_pop(delta) OVER w) >= 2.1 THEN 'LONG'
       |       WHEN count(*) OVER w >= 30 AND stddev_pop(delta) OVER w > 0
       |            AND (delta - avg(delta) OVER w) / (stddev_pop(delta) OVER w) <= -2.1 THEN 'SHORT'
       |       ELSE 'NONE' END AS signal
       |FROM d
       |WINDOW w AS (ORDER BY bucket ROWS BETWEEN 2999 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Normalized cumulative volume delta per bucket, clamped to [-1,1];
    * 0.0 when total volume is zero (aether_oracle.py:123-153). */
  private def cvdDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    deltaDf(spark, dir)
      .withColumn(
        "cvd",
        coalesce(
          least(
            greatest(
              ($"buy_vol" - $"sell_vol") /
                when($"buy_vol" + $"sell_vol" =!= 0.0, $"buy_vol" + $"sell_vol"),
              lit(-1.0)),
            lit(1.0)),
          lit(0.0)))
      .select("bucket", "buy_vol", "sell_vol", "cvd")
  }

  private val cvdSql: String =
    s"""WITH d AS ($deltaSql)
       |SELECT bucket, buy_vol, sell_vol,
       |  coalesce(least(greatest((buy_vol - sell_vol) / nullif(buy_vol + sell_vol, 0.0), -1.0), 1.0), 0.0) AS cvd
       |FROM d""".stripMargin

  /** Liquidity velocity per hour: sum(qty) / (sum(|ΔP|) + 1e-6), computed at
    * 1h and 4h resolutions and correlated (the §2.4 window equi-join); the
    * micro-trap flag fires when lv_1h > 1.5 * lv_4h (aether_oracle.py:83-121).
    */
  private[operators] def lvDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    // event_id is globally unique and monotone in ts => deterministic lag.
    val diffs = ev.withColumn(
      "dp",
      abs($"value" - lag($"value", 1).over(Window.orderBy($"event_id"))))
    val h1 = diffs
      .groupBy(expr(s"ts_us div $HourUs").as("bucket"))
      .agg(sum($"value").as("qty1"), sum($"dp").as("dp1"))
      .withColumn("lv_1h", $"qty1" / (coalesce($"dp1", lit(0.0)) + 1e-6))
    val h4 = diffs
      .groupBy(expr(s"ts_us div ${4 * HourUs}").as("bucket4"))
      .agg(sum($"value").as("qty4"), sum($"dp").as("dp4"))
      .withColumn("lv_4h", $"qty4" / (coalesce($"dp4", lit(0.0)) + 1e-6))
    h1.join(h4, expr("bucket div 4") === $"bucket4")
      .withColumn("micro_trap", $"lv_1h" > lit(1.5) * $"lv_4h")
      .select("bucket", "lv_1h", "lv_4h", "micro_trap")
  }

  private[operators] val lvSql: String =
    s"""WITH diffs AS (
       |  SELECT epoch_us(ts) AS ts_us, value,
       |         abs(value - lag(value) OVER (ORDER BY event_id)) AS dp
       |  FROM events),
       |h1 AS (
       |  SELECT ts_us // $HourUs AS bucket,
       |         sum(value) / (coalesce(sum(dp), 0.0) + 1e-6) AS lv_1h
       |  FROM diffs GROUP BY 1),
       |h4 AS (
       |  SELECT ts_us // ${4 * HourUs} AS bucket4,
       |         sum(value) / (coalesce(sum(dp), 0.0) + 1e-6) AS lv_4h
       |  FROM diffs GROUP BY 1)
       |SELECT h1.bucket, h1.lv_1h, h4.lv_4h, h1.lv_1h > 1.5 * h4.lv_4h AS micro_trap
       |FROM h1 JOIN h4 ON h1.bucket // 4 = h4.bucket4""".stripMargin

  /** Volume-rate ratio: recent 1h qty/sec vs the trailing-24h baseline,
    * clamped to [0.5, 2.0] (data_manager.py:1005-1035). */
  private[operators] def volRateDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"bucket").rowsBetween(-23, 0)
    Tables
      .events(spark, dir)
      .groupBy(expr(s"ts_us div $HourUs").as("bucket"))
      .agg(sum($"value").as("qty"))
      .withColumn("recent_rate", $"qty" / 3600.0)
      .withColumn(
        "baseline_rate",
        sum($"qty").over(w) / (count(lit(1)).over(w) * 3600.0))
      .withColumn(
        "vol_factor",
        least(
          greatest(
            $"recent_rate" / when($"baseline_rate" =!= 0.0, $"baseline_rate"),
            lit(0.5)),
          lit(2.0)))
      .select("bucket", "qty", "recent_rate", "baseline_rate", "vol_factor")
  }

  private[operators] val volRateSql: String =
    s"""WITH h AS (
       |  SELECT epoch_us(ts) // $HourUs AS bucket, sum(value) AS qty
       |  FROM events GROUP BY 1)
       |SELECT bucket, qty, qty / 3600.0 AS recent_rate,
       |  sum(qty) OVER w / (count(*) OVER w * 3600.0) AS baseline_rate,
       |  least(greatest((qty / 3600.0) / nullif(sum(qty) OVER w / (count(*) OVER w * 3600.0), 0.0), 0.5), 2.0) AS vol_factor
       |FROM h
       |WINDOW w AS (ORDER BY bucket ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "flow_delta" -> (deltaDf(_, _)),
    "flow_zscore" -> (zscoreDf(_, _)),
    "flow_cvd" -> (cvdDf(_, _)),
    "flow_lv" -> (lvDf(_, _)),
    "flow_volrate" -> (volRateDf(_, _))
  )

  val oracles: Map[String, String] = Map(
    "flow_delta" -> deltaSql,
    "flow_zscore" -> zscoreSql,
    "flow_cvd" -> cvdSql,
    "flow_lv" -> lvSql,
    "flow_volrate" -> volRateSql
  )
}
