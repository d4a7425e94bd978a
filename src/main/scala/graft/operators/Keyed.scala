package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.OpModule

/** Keyed (multi-symbol-shaped) variants: the reference is single-symbol,
  * so most ordered windows above run on one already-reduced partition.
  * These queries are the same operators *with a partition key*, proving
  * the multi-symbol plan shape the engine runs at scale: every window and
  * aggregation below parallelizes across shards with no global ordering.
  *
  *  - `flow_zscore_keyed`: the signature rolling z-score per shard
  *    (`Window.partitionBy(shard)`) — what `groupBy(symbol)` looks like
  *    on a real multi-instrument feed.
  *  - `order_rate_limit`: the reference's sliding-window rate limiter
  *    (20 orders / 60 s, order_manager.py:44-57) as a per-key RANGE-frame
  *    count over event time — a declarative replay of sink-side state.
  *  - `order_success_rate`: count(filled)/count(*) per priority class
  *    (order_manager.py:444-466).
  */
object Keyed extends OpModule {

  val Shards = 8
  val RateLimit = 20 // orders per sliding minute (config.py:56)

  private def zscoreKeyedDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"shard").orderBy($"bucket")
      .rowsBetween(-2999, 0)
    Tables.eventsWithSide(spark, dir)
      .withColumn("shard", $"user_id" % Shards)
      .groupBy($"shard", expr(s"ts_us div ${Flow.DeltaBucketUs}").as("bucket"))
      .agg((sum(when($"is_buy", $"value").otherwise(0.0)) -
        sum(when(!$"is_buy", $"value").otherwise(0.0))).as("delta"))
      .withColumn("mu", avg($"delta").over(w))
      .withColumn("sigma", stddev_pop($"delta").over(w))
      .withColumn("n_pop", count(lit(1)).over(w))
      // round(6): (delta - mu) cancels to ~1e-2 while the inputs are
      // O(1e2), so engine-different summation trees diverge past the
      // compare tolerance on ~1/10k rows; quantizing the *output* keeps
      // the check exact without changing the estimator
      .withColumn("z",
        when($"n_pop" >= 30 && $"sigma" > 0,
          round(($"delta" - $"mu") / $"sigma", 6)))
      .select("shard", "bucket", "delta", "z")
  }

  private val zscoreKeyedSql: String =
    s"""WITH d AS (
       |  SELECT user_id % $Shards AS shard,
       |    epoch_us(ts) // ${Flow.DeltaBucketUs} AS bucket,
       |    sum(CASE WHEN ${Tables.BuySql} THEN value ELSE 0.0 END)
       |      - sum(CASE WHEN ${Tables.BuySql} THEN 0.0 ELSE value END) AS delta
       |  FROM events GROUP BY 1, 2)
       |SELECT shard, bucket, delta,
       |  CASE WHEN count(*) OVER w >= 30 AND stddev_pop(delta) OVER w > 0
       |       THEN round((delta - avg(delta) OVER w) / (stddev_pop(delta) OVER w), 6)
       |  END AS z
       |FROM d
       |WINDOW w AS (PARTITION BY shard ORDER BY bucket
       |             ROWS BETWEEN 2999 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Sliding 60-second per-user submission counter; a submission is
    * allowed while the trailing-minute count stays within the limit. */
  private def rateLimitDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_sec")
      .rangeBetween(-59, 0)
    Tables.events(spark, dir)
      .withColumn("ts_sec", expr("ts_us div 1000000"))
      .withColumn("n_last_min", count(lit(1)).over(w))
      .withColumn("allowed", $"n_last_min" <= RateLimit)
      .select("event_id", "user_id", "ts_sec", "n_last_min", "allowed")
  }

  private val rateLimitSql: String =
    s"""SELECT event_id, user_id, epoch_us(ts) // 1000000 AS ts_sec,
       |  count(*) OVER w AS n_last_min,
       |  count(*) OVER w <= $RateLimit AS allowed
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
       |             RANGE BETWEEN 59 PRECEDING AND CURRENT ROW)""".stripMargin

  private def successRateDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        avg(when($"o_orderstatus" === "F", 1.0).otherwise(0.0))
          .as("fill_rate"))
  }

  private val successRateSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  avg(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END) AS fill_rate
      |FROM orders GROUP BY 1""".stripMargin

  val SaltBuckets = 16

  /** Two-phase salted aggregation for skewed keys: event_type has only 5
    * hot values, so a plain groupBy concentrates each key on one reducer.
    * Salting by event_id%N spreads each hot key over N partial aggregates
    * that a cheap second pass folds — the declarative AQE-independent
    * skew guard. The oracle is the UNSALTED aggregation: same answer by
    * construction, which is the point of the pattern. */
  private def saltedDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("salt", $"event_id" % SaltBuckets)
      .groupBy($"event_type", $"salt")
      .agg(sum($"value").as("pv"), count(lit(1)).as("pn"),
        max($"value").as("pmax"))
      .groupBy($"event_type")
      .agg(sum($"pv").as("volume"), sum($"pn").as("n_events"),
        max($"pmax").as("max_value"))
  }

  private val saltedSql: String =
    """SELECT event_type, sum(value) AS volume, count(*) AS n_events,
      |  max(value) AS max_value
      |FROM events GROUP BY 1""".stripMargin

  /** Rank-statistics windows (`window_ranks`) — the §2.6 functions not
    * yet exercised: percent_rank / cume_dist / ntile(4) per event_type,
    * ordered by (value, event_id) so the order is TOTAL and every rank
    * statistic is engine-deterministic (ntile splits ties by position —
    * an order with duplicates would let the engines disagree on which
    * row lands in which quartile). Rank windows partition by the key,
    * so the plan parallelizes per key like every other keyed window
    * here. percent_rank and cume_dist are exact rationals of integer
    * rank counts — identical doubles on both engines. */
  private def windowRanksDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
    Tables.events(spark, dir)
      .select($"event_id", $"event_type", $"value")
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("tile", ntile(4).over(w).cast("long"))
  }

  private val windowRanksSql: String =
    """SELECT event_id, event_type, value,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  ntile(4) OVER w::BIGINT AS tile
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_ranks" -> (windowRanksDf(_, _)),
    "flow_zscore_keyed" -> (zscoreKeyedDf(_, _)),
    "order_rate_limit" -> (rateLimitDf(_, _)),
    "order_success_rate" -> (successRateDf(_, _)),
    "agg_salted" -> (saltedDf(_, _))
  )

  val oracles: Map[String, String] = Map(
    "window_ranks" -> windowRanksSql,
    "flow_zscore_keyed" -> zscoreKeyedSql,
    "order_rate_limit" -> rateLimitSql,
    "order_success_rate" -> successRateSql,
    "agg_salted" -> saltedSql
  )
}
