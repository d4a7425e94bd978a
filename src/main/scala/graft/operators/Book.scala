package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.OpModule

/** Order-book shape analytics (SURVEY.md §2.5). The testdata has no L2 book
  * table, so each hourly bucket of `events` is treated as one book snapshot:
  * rows on the buy side are "bids", sell side "asks", `value` is the level
  * quantity, and levels rank by quantity (event_id tie-break) — a fixed,
  * documented analogue of the reference's sorted 20-level depth arrays
  * (data_manager.py:484-485).
  *
  *  - depth imbalance (strategy.py:939-964): (Σbid-Σask)/(Σbid+Σask) over
  *    the top-20 levels per side, gated at ±0.65 (config.py:65)
  *  - wall strength (strategy.py:966-998): zone-band sum / mean top-20
  *    level, gated at 4.2x (config.py:70)
  *  - touch distance (strategy.py:1046-1068): |close - best level| in ticks,
  *    gated at <= 4 ticks (config.py:69)
  *
  * Shape notes for scale: the rank-and-truncate is one window per
  * (bucket, side) — at real book depth this is the standard top-k-per-group
  * pattern (partial top-k per partition before the shuffle would come from
  * a `Window` + filter, which Spark executes with a partial sort); all
  * downstream math is hash aggregation with map-side combine.
  */
object Book extends OpModule {
  import Flow.HourUs

  val Depth = 20          // WALL_DEPTH_LEVELS (config.py:64)
  val ImbGate = 0.65      // config.py:65
  val WallGate = 4.2      // config.py:70
  val TouchGateTicks = 4.0 // config.py:69
  // Zone half-width and tick size, relative: the reference's +-12 ticks of
  // an absolute tick size (config.py:63,68) become +-12% / 0.1% of mid here.
  val ZonePct = 0.12
  val TickPct = 0.001

  /** Per (bucket, side): levels ranked by qty desc, top `Depth` kept. */
  private def levels(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"bucket", $"is_buy")
      .orderBy($"value".desc, $"event_id")
    Tables
      .eventsWithSide(spark, dir)
      .withColumn("bucket", expr(s"ts_us div $HourUs"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= Depth)
  }

  private val levelsSql: String =
    s"""SELECT epoch_us(ts) // $HourUs AS bucket, value, event_id,
       |  ${Tables.BuySql} AS is_buy,
       |  row_number() OVER (PARTITION BY epoch_us(ts) // $HourUs, ${Tables.BuySql}
       |                     ORDER BY value DESC, event_id) AS rn
       |FROM events QUALIFY rn <= $Depth""".stripMargin

  private[operators] def imbalanceDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    levels(spark, dir)
      .groupBy($"bucket")
      .agg(
        sum(when($"is_buy", $"value").otherwise(0.0)).as("bid_vol"),
        sum(when(!$"is_buy", $"value").otherwise(0.0)).as("ask_vol"))
      .withColumn(
        "imbalance",
        ($"bid_vol" - $"ask_vol") /
          when($"bid_vol" + $"ask_vol" =!= 0.0, $"bid_vol" + $"ask_vol"))
      .withColumn("long_ok", $"imbalance" >= ImbGate)
      .withColumn("short_ok", $"imbalance" <= -ImbGate)
      .select("bucket", "bid_vol", "ask_vol", "imbalance", "long_ok", "short_ok")
  }

  private[operators] val imbalanceSql: String =
    s"""WITH lv AS ($levelsSql),
       |a AS (SELECT bucket,
       |  sum(CASE WHEN is_buy THEN value ELSE 0.0 END) AS bid_vol,
       |  sum(CASE WHEN is_buy THEN 0.0 ELSE value END) AS ask_vol
       |  FROM lv GROUP BY 1)
       |SELECT bucket, bid_vol, ask_vol,
       |  (bid_vol - ask_vol) / nullif(bid_vol + ask_vol, 0.0) AS imbalance,
       |  (bid_vol - ask_vol) / nullif(bid_vol + ask_vol, 0.0) >= $ImbGate AS long_ok,
       |  (bid_vol - ask_vol) / nullif(bid_vol + ask_vol, 0.0) <= -$ImbGate AS short_ok
       |FROM a""".stripMargin

  /** Wall: zone = mid*(1 +- 12%), strength = zone volume / (side top-20
    * volume / 20). mid = mean level qty stands in for mid price. */
  private[operators] def wallDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    levels(spark, dir)
      .withColumn("mid", avg($"value").over(Window.partitionBy($"bucket")))
      .groupBy($"bucket")
      .agg(
        max($"mid").as("mid"),
        sum(when($"is_buy", $"value").otherwise(0.0)).as("bid_vol"),
        sum(when(!$"is_buy", $"value").otherwise(0.0)).as("ask_vol"),
        sum(when($"is_buy" &&
          $"value".between($"mid" * (1 - ZonePct), $"mid" * (1 + ZonePct)),
          $"value").otherwise(0.0)).as("bid_zone"),
        sum(when(!$"is_buy" &&
          $"value".between($"mid" * (1 - ZonePct), $"mid" * (1 + ZonePct)),
          $"value").otherwise(0.0)).as("ask_zone"))
      .withColumn("bid_wall",
        $"bid_zone" / when($"bid_vol" =!= 0.0, $"bid_vol" / Depth))
      .withColumn("ask_wall",
        $"ask_zone" / when($"ask_vol" =!= 0.0, $"ask_vol" / Depth))
      // coalesce(false): a bucket with no levels on one side gates closed
      // rather than unknown (keeps the boolean non-null on both engines)
      .withColumn("bid_wall_ok", coalesce($"bid_wall" >= WallGate, lit(false)))
      .withColumn("ask_wall_ok", coalesce($"ask_wall" >= WallGate, lit(false)))
      .select("bucket", "mid", "bid_zone", "ask_zone", "bid_wall", "ask_wall",
        "bid_wall_ok", "ask_wall_ok")
  }

  private[operators] val wallSql: String =
    s"""WITH lv AS ($levelsSql),
       |m AS (SELECT *, avg(value) OVER (PARTITION BY bucket) AS mid FROM lv),
       |a AS (SELECT bucket, max(mid) AS mid,
       |  sum(CASE WHEN is_buy THEN value ELSE 0.0 END) AS bid_vol,
       |  sum(CASE WHEN is_buy THEN 0.0 ELSE value END) AS ask_vol,
       |  sum(CASE WHEN is_buy AND value BETWEEN mid * ${1 - ZonePct} AND mid * ${1 + ZonePct}
       |      THEN value ELSE 0.0 END) AS bid_zone,
       |  sum(CASE WHEN NOT is_buy AND value BETWEEN mid * ${1 - ZonePct} AND mid * ${1 + ZonePct}
       |      THEN value ELSE 0.0 END) AS ask_zone
       |  FROM m GROUP BY 1)
       |SELECT bucket, mid, bid_zone, ask_zone,
       |  bid_zone / nullif(bid_vol / $Depth, 0.0) AS bid_wall,
       |  ask_zone / nullif(ask_vol / $Depth, 0.0) AS ask_wall,
       |  coalesce(bid_zone / nullif(bid_vol / $Depth, 0.0) >= $WallGate, false) AS bid_wall_ok,
       |  coalesce(ask_zone / nullif(ask_vol / $Depth, 0.0) >= $WallGate, false) AS ask_wall_ok
       |FROM a""".stripMargin

  /** Touch: distance of the bucket close to the best (rank-1) level per
    * side, in 0.1%-of-close ticks. */
  private[operators] def touchDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val best = levels(spark, dir)
      .filter($"rn" === 1)
      .groupBy($"bucket")
      .agg(
        max(when($"is_buy", $"value")).as("best_bid"),
        max(when(!$"is_buy", $"value")).as("best_ask"))
    Bars
      .ohlcDf(spark, dir)
      .select($"bucket", $"close")
      .join(best, Seq("bucket"))
      .withColumn("tick", $"close" * TickPct)
      .withColumn("bid_ticks", abs($"close" - $"best_bid") / $"tick")
      .withColumn("ask_ticks", abs($"close" - $"best_ask") / $"tick")
      .withColumn("bid_touch_ok",
        coalesce($"bid_ticks" <= TouchGateTicks, lit(false)))
      .withColumn("ask_touch_ok",
        coalesce($"ask_ticks" <= TouchGateTicks, lit(false)))
      .select("bucket", "close", "best_bid", "best_ask", "bid_ticks",
        "ask_ticks", "bid_touch_ok", "ask_touch_ok")
  }

  private[operators] val touchSql: String =
    s"""WITH lv AS ($levelsSql),
       |best AS (SELECT bucket,
       |    max(CASE WHEN is_buy THEN value END) AS best_bid,
       |    max(CASE WHEN NOT is_buy THEN value END) AS best_ask
       |  FROM lv WHERE rn = 1 GROUP BY 1),
       |ohlc AS (${Bars.ohlcSql})
       |SELECT ohlc.bucket, close, best_bid, best_ask,
       |  abs(close - best_bid) / (close * $TickPct) AS bid_ticks,
       |  abs(close - best_ask) / (close * $TickPct) AS ask_ticks,
       |  coalesce(abs(close - best_bid) / (close * $TickPct) <= $TouchGateTicks, false) AS bid_touch_ok,
       |  coalesce(abs(close - best_ask) / (close * $TickPct) <= $TouchGateTicks, false) AS ask_touch_ok
       |FROM ohlc JOIN best ON ohlc.bucket = best.bucket""".stripMargin

  /** The ArrayType(Struct) book model (SURVEY §1.1 #3): one row per
    * snapshot with sorted level *arrays*, depth-capped with `slice` and
    * aggregated with the array fold — the reference's
    * `List[(price, qty)]` sorted-wholesale-per-update representation
    * kept intact instead of exploded. Both engines sort (qty desc,
    * event_id), cap at 20, and fold in array order, so sums match
    * bitwise. */
  private def arrayBookDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def cmp(l: Column, r: Column): Column =
      when(l.getField("value") > r.getField("value"), -1)
        .when(l.getField("value") < r.getField("value"), 1)
        .otherwise(
          when(l.getField("event_id") < r.getField("event_id"), -1)
            .when(l.getField("event_id") > r.getField("event_id"), 1)
            .otherwise(0))
    def sideArr(buy: Boolean) = slice(
      array_sort(
        collect_list(when(if (buy) $"is_buy" else !$"is_buy",
          struct($"value", $"event_id"))),
        cmp _),
      1, Depth)
    def arrSum(a: Column) = aggregate(
      transform(a, x => x.getField("value")), lit(0.0), (acc, v) => acc + v)
    Tables.eventsWithSide(spark, dir)
      .withColumn("bucket", expr(s"ts_us div $HourUs"))
      .groupBy($"bucket")
      .agg(sideArr(buy = true).as("bids"), sideArr(buy = false).as("asks"))
      .select($"bucket",
        size($"bids").as("bid_depth"), size($"asks").as("ask_depth"),
        arrSum($"bids").as("bid_vol"), arrSum($"asks").as("ask_vol"))
      .withColumn("imbalance",
        ($"bid_vol" - $"ask_vol") /
          when($"bid_vol" + $"ask_vol" =!= 0.0, $"bid_vol" + $"ask_vol"))
  }

  private val arrayBookSql: String = {
    def sideList(cond: String) =
      s"list(value ORDER BY value DESC, event_id) FILTER (WHERE $cond)[1:$Depth]"
    def listSum(l: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, $l), (acc, v) -> acc + v)"
    s"""WITH b AS (
       |  SELECT epoch_us(ts) // $HourUs AS bucket,
       |    ${sideList(Tables.BuySql)} AS bids,
       |    ${sideList(s"NOT (${Tables.BuySql})")} AS asks
       |  FROM events GROUP BY 1),
       |s AS (SELECT bucket,
       |    coalesce(len(bids), 0) AS bid_depth,
       |    coalesce(len(asks), 0) AS ask_depth,
       |    coalesce(${listSum("bids")}, 0.0) AS bid_vol,
       |    coalesce(${listSum("asks")}, 0.0) AS ask_vol
       |  FROM b)
       |SELECT bucket, bid_depth, ask_depth, bid_vol, ask_vol,
       |  (bid_vol - ask_vol) / nullif(bid_vol + ask_vol, 0.0) AS imbalance
       |FROM s""".stripMargin
  }

  // Shared final strings: every operand is an exact integer (cents),
  // so the microprice and its tilt are engine-stable by construction.
  private val microFinal: Seq[String] = Seq(
    "bucket",
    "bid_c", "ask_c", "bvol_c", "avol_c",
    "cast(bvol_c * ask_c + avol_c * bid_c as double) / (bvol_c + avol_c) / 100.0 as microprice",
    "cast(floor((cast(bvol_c * ask_c + avol_c * bid_c as double) / (bvol_c + avol_c) / 100.0 - cast(bid_c + ask_c as double) / 200.0) / (cast(bid_c + ask_c as double) / 200.0) * 1e4) as bigint) as tilt_bps")

  /** Microprice (`book_microprice`): the size-weighted fair price
    * I·ask + (1−I)·bid with I = bid volume share (Stoikov 2018) — the
    * short-horizon price predictor desks quote around, leaning toward
    * the HEAVIER side's opposite quote. Inputs are the same rank-1
    * best levels as `book_touch` and the side top-20 volumes as
    * `book_imbalance`, all in exact integer cents; tilt_bps floors the
    * microprice's deviation from the naive mid. One aggregation over
    * the level frame, never a per-tick window. */
  private[operators] def micropriceDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    levels(spark, dir)
      .withColumn("v_c", round($"value" * 100).cast("long"))
      .groupBy($"bucket")
      .agg(
        max(when($"is_buy" && $"rn" === 1, $"v_c")).as("bid_c"),
        max(when(!$"is_buy" && $"rn" === 1, $"v_c")).as("ask_c"),
        sum(when($"is_buy", $"v_c").otherwise(0L)).as("bvol_c"),
        sum(when(!$"is_buy", $"v_c").otherwise(0L)).as("avol_c"))
      // the mid guard also covers ANSI: a thin bucket whose best levels
      // are both zero-cent would divide by zero in the tilt
      .filter($"bid_c".isNotNull && $"ask_c".isNotNull &&
        $"bvol_c" + $"avol_c" > 0 && $"bid_c" + $"ask_c" > 0)
      .selectExpr(microFinal: _*)
  }

  private[operators] val micropriceSql: String =
    s"""WITH lv AS ($levelsSql),
       |c AS (SELECT bucket, round(value * 100)::BIGINT AS v_c, is_buy, rn
       |      FROM lv),
       |a AS (SELECT bucket,
       |    max(CASE WHEN is_buy AND rn = 1 THEN v_c END) AS bid_c,
       |    max(CASE WHEN NOT is_buy AND rn = 1 THEN v_c END) AS ask_c,
       |    sum(CASE WHEN is_buy THEN v_c ELSE 0 END)::BIGINT AS bvol_c,
       |    sum(CASE WHEN NOT is_buy THEN v_c ELSE 0 END)::BIGINT AS avol_c
       |  FROM c GROUP BY 1)
       |SELECT ${microFinal.mkString(", ")} FROM a
       |WHERE bid_c IS NOT NULL AND ask_c IS NOT NULL
       |  AND bvol_c + avol_c > 0 AND bid_c + ask_c > 0""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "book_microprice" -> (micropriceDf(_, _)),
    "book_imbalance" -> (imbalanceDf(_, _)),
    "book_wall" -> (wallDf(_, _)),
    "book_touch" -> (touchDf(_, _)),
    "book_array_imbalance" -> (arrayBookDf(_, _))
  )

  val oracles: Map[String, String] = Map(
    "book_microprice" -> micropriceSql,
    "book_imbalance" -> imbalanceSql,
    "book_wall" -> wallSql,
    "book_touch" -> touchSql,
    "book_array_imbalance" -> arrayBookSql
  )
}
