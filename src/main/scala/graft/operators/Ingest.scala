package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.OpModule

/** Ingestion-edge operators (SURVEY §2.1, §2.3, §2.9):
  *
  *  - `ingest_validated`: the reference's validity filters — drop
  *    non-positive prices/quantities and zero timestamps, dedupe repeated
  *    deliveries by event id (data_manager.py:513-514, 282-286) — plus
  *    the wire-format cast chain (string-encoded decimal -> double,
  *    futures_api.py:349-364): the JSON `props` payload's `k` field is
  *    parsed and cast exactly as the reference casts `close_str`.
  *  - `session_agg`: fixed UTC session bucketing (Asia/London/NY,
  *    config.py:112-115) — a pure hour-of-day expression, not a gap
  *    session window — with per-session aggregates.
  *  - `session_gap_agg`: the NATIVE gap-based session window the engine
  *    offers beyond the reference (whose "sessions" are the fixed UTC
  *    ranges above): `session_window(ts, gap)` merges a user's events
  *    while consecutive gaps stay under 2 h; a session ends at
  *    last-event-ts + gap. Spark executes it as a sort-based session
  *    aggregation partitioned by the grouping key — one shuffle on
  *    (user_id), no self-join — and the SAME operator runs streaming
  *    with a watermark (state = open sessions only). The oracle is the
  *    classic lag -> new-session flag -> running-sum session id.
  *
  * All are scan-level map work plus one hash/sort aggregation: the
  * filters and the projection reach the parquet scan (PushedFilters), so
  * at 100 TB invalid rows are skipped before they cost anything
  * downstream.
  */
object Ingest extends OpModule {

  private def validatedDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // whole-row max_by with a composite (ts, value) key: ties on ts alone
    // would let the oracle's per-column arg_max assemble a chimera row —
    // both engines must pick ONE row, deterministically
    Tables.events(spark, dir)
      .filter($"value" > 0.0 && $"ts_us" > 0L)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_id")
      .agg(max_by(struct($"ts_us", $"event_type", $"value", $"k"),
        struct($"ts_us", $"value", $"event_type")).as("r"))
      .select($"event_id", $"r.ts_us".as("ts_us"),
        $"r.event_type".as("event_type"), $"r.value".as("value"),
        $"r.k".as("k"))
  }

  // row_number, not per-column arg_max: the winner must be ONE row on
  // both engines (per-column picks could assemble a chimera from tied
  // rows); DuckDB 1.0's arg_max rejects composite keys, so the oracle
  // ranks explicitly with the same (ts, value, event_type) key
  private val validatedSql: String =
    """SELECT event_id, epoch_us(ts) AS ts_us, event_type, value,
      |  json_extract_string(props, '$.k')::BIGINT AS k
      |FROM events
      |WHERE value > 0.0 AND epoch_us(ts) > 0
      |QUALIFY row_number() OVER (PARTITION BY event_id
      |  ORDER BY epoch_us(ts) DESC, value DESC, event_type DESC) = 1""".stripMargin

  // Fixed UTC session ranges (the reference's config.py:112-115 shape).
  private val sessions = Seq(
    ("ASIA", 0, 8), ("LONDON", 8, 13), ("NY", 13, 21), ("LATE", 21, 24))

  private def sessionDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourOfDay = expr("(ts_us div 3600000000) % 24")
    val label = sessions.foldLeft(lit("LATE")) {
      case (acc, (name, lo, hi)) =>
        when(hourOfDay >= lo && hourOfDay < hi, name).otherwise(acc)
    }
    Tables.eventsWithSide(spark, dir)
      .withColumn("session", label)
      .groupBy($"session")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"value").as("volume"),
        avg($"value").as("avg_value"),
        sum(when($"is_buy", $"value").otherwise(0.0)).as("buy_volume"))
  }

  private val sessionSql: String = {
    val hourOfDay = "(epoch_us(ts) // 3600000000) % 24"
    val label = sessions.reverse.foldRight("'LATE'") {
      case ((name, lo, hi), acc) =>
        s"CASE WHEN $hourOfDay >= $lo AND $hourOfDay < $hi THEN '$name' ELSE $acc END"
    }
    s"""SELECT $label AS session,
       |  count(*) AS n_events, sum(value) AS volume, avg(value) AS avg_value,
       |  sum(CASE WHEN ${Tables.BuySql} THEN value ELSE 0.0 END) AS buy_volume
       |FROM events GROUP BY 1""".stripMargin
  }

  /** Session gap: 2 h in event time. p10 of per-user inter-event gaps in
    * the testdata is ~69 min, so a meaningful fraction of consecutive
    * events merge while most sessions stay short — the interesting case
    * for a session operator. */
  val SessionGapUs: Long = 7200000000L

  private def sessionGapDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id", session_window($"ts", "2 hours").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum($"value").as("total_value"))
      .select($"user_id",
        expr("unix_micros(w.start)").as("session_start_us"),
        expr("unix_micros(w.end)").as("session_end_us"),
        $"n_events", $"total_value")
  }

  // Boundary parity: Spark merges an event into the open session iff
  // ts < last_ts + gap (strict), so the oracle's new-session flag fires
  // on diff >= gap — the same strictness.
  private val sessionGapSql: String =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
       |m AS (
       |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
       |                   OR ts_us - lag(ts_us) OVER w >= $SessionGapUs
       |                 THEN 1 ELSE 0 END AS new_s
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
       |s AS (
       |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM m)
       |SELECT user_id, min(ts_us) AS session_start_us,
       |  max(ts_us) + $SessionGapUs AS session_end_us,
       |  count(*) AS n_events, sum(value) AS total_value
       |FROM s GROUP BY user_id, sid""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ingest_validated" -> (validatedDf(_, _)),
    "session_agg" -> (sessionDf(_, _)),
    "session_gap_agg" -> (sessionGapDf(_, _))
  )

  val oracles: Map[String, String] = Map(
    "ingest_validated" -> validatedSql,
    "session_agg" -> sessionSql,
    "session_gap_agg" -> sessionGapSql
  )
}
