package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.ColFns
import graft.OpModule

/** Signal fusion (SURVEY.md §2.10-§2.11): joins every per-bucket signal
  * family into one wide frame and evaluates the reference's scoring
  * cascade as pure column arithmetic:
  *
  *  - CDF squash of each raw signal against its (regime-adjusted) gate
  *    (strategy.py:139-150; regime shifts strategy.py:78-133)
  *  - 5-signal core score, weights .25/.20/.30/.10/.15
  *    (strategy.py:152-217, config.py:167-171)
  *  - Monte-Carlo component in closed form Φ(sign·μ/σ) — the reference
  *    draws 100 seeded normals (aether_oracle.py:266-294); expectation is
  *    identical and deterministic (documented deviation, SURVEY §7.3)
  *  - Bayes sigmoid component (aether_oracle.py:296-329)
  *  - RL proxy 0.5 + (0.5 − hurst) clamped (aether_oracle.py:331-341)
  *  - fused = weighted avg of the *present* components with weight
  *    renormalization (aether_oracle.py:410-493, None-skipping
  *    strategy.py:296-302)
  *  - Kelly fraction capped at 0.02 (aether_oracle.py:343-352)
  *  - win-probability overlay, entry gates (strategy.py:310-328,499-543)
  *
  * Scale shape: ten signal frames join on the same hourly `bucket` key —
  * each is already aggregated (720 rows at sf0.01), so the joins are
  * trivially broadcast/co-partitioned; everything downstream is
  * whole-stage-codegen arithmetic with zero additional shuffles. At 100 TB
  * the expensive part is the upstream aggregations (each one shuffle on
  * (bucket) or (bucket, side)); this module adds none.
  *
  * Every formula is written twice — Column ops here, SQL text below — in
  * the same operation order with the same double literals, so the oracle
  * comparison is exact to the driver's 1e-9 rounding.
  */
object Scores extends OpModule {
  import Flow.HourUs

  // Regime thresholds chosen for the testdata's atr_pct distribution
  // (median ~4): LOW < 2.5, HIGH > 8 — the reference's 0.0015/0.0030
  // (config.py:134-135) rescaled to this data's volatility units.
  val AtrLow = 2.5
  val AtrHigh = 8.0
  val ZGate = 2.1      // config.py:66
  val ZShift = 0.3     // strategy.py:92-97
  val WallGate = 4.2   // config.py:70
  val WallGateHigh = 3.8 // config.py:139-141
  val ImbGate = 0.65   // config.py:65
  val KellyB = 1.5
  val KellyCap = 0.02  // aether_oracle.py:350
  val EntryTotal = 0.32 // entry gate, calibrated to this data (see below)
  val EntryWinprob = 0.52

  /** squash(v, t) = Φ((v − t)/(t/2)) — the reference's norm.cdf signal
    * normalizer (strategy.py:139-150). */
  private def squash(v: Column, t: Column): Column =
    ColFns.normCdf((v - t) / (t / lit(2.0)))

  private def squashSql(v: String, t: String): String =
    ColFns.normCdfSql(s"((($v) - ($t)) / (($t) / 2.0))")

  /** The wide per-bucket signal frame: all families left-joined onto the
    * hourly bar spine. */
  private[operators] def signalsDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val atr = Bars.atrDf(spark, dir).select($"bucket", $"close", $"atr_pct")
    // z lives on 10-minute buckets; the hour inherits its last defined z
    val zh = Flow.zscoreDf(spark, dir)
      .filter($"z".isNotNull)
      .groupBy(expr("bucket div 6").as("bucket"))
      .agg(max_by($"z", $"bucket").as("z"))
    val cvdh = Tables.eventsWithSide(spark, dir)
      .groupBy(expr(s"ts_us div $HourUs").as("bucket"))
      .agg(
        sum(when($"is_buy", $"value").otherwise(0.0)).as("bv"),
        sum(when(!$"is_buy", $"value").otherwise(0.0)).as("sv"))
      .withColumn("cvd",
        coalesce(
          least(greatest(($"bv" - $"sv") /
            when($"bv" + $"sv" =!= 0.0, $"bv" + $"sv"), lit(-1.0)), lit(1.0)),
          lit(0.0)))
      .select("bucket", "cvd")
    val imb = Book.imbalanceDf(spark, dir).select($"bucket", $"imbalance")
    val wall = Book.wallDf(spark, dir).select($"bucket", $"bid_wall", $"ask_wall")
    val touch = Book.touchDf(spark, dir)
      .select($"bucket", $"bid_touch_ok", $"ask_touch_ok")
    val lv = Flow.lvDf(spark, dir).select($"bucket", $"lv_1h")
    val vr = Flow.volRateDf(spark, dir).select($"bucket", $"vol_factor")
    val bos = LongMemory.bosDf(spark, dir).select($"bucket", $"bos")
    val grp = Bars.ohlcDf(spark, dir)
      .select($"bucket")
      .withColumn("rn", row_number().over(Window.orderBy($"bucket")) - 1)
      .withColumn("grp", expr(s"rn div ${LongMemory.HurstN}"))
      .select("bucket", "grp")
    val hurst = grp.join(
      LongMemory.hurstDf(spark, dir).select($"grp", $"hurst"), Seq("grp"), "left")
      .select("bucket", "hurst")

    atr
      .join(zh, Seq("bucket"), "left")
      .join(cvdh, Seq("bucket"), "left")
      .join(imb, Seq("bucket"), "left")
      .join(wall, Seq("bucket"), "left")
      .join(touch, Seq("bucket"), "left")
      .join(lv, Seq("bucket"), "left")
      .join(vr, Seq("bucket"), "left")
      .join(bos, Seq("bucket"), "left")
      .join(hurst, Seq("bucket"), "left")
  }

  private val signalsSql: String =
    s"""atr AS (${Bars.atrSql}),
       |zh AS (SELECT bucket // 6 AS bucket, arg_max(z, bucket) AS z
       |       FROM (${Flow.zscoreSql}) zq WHERE z IS NOT NULL GROUP BY 1),
       |cvdh AS (SELECT epoch_us(ts) // $HourUs AS bucket,
       |  coalesce(least(greatest(
       |    (sum(CASE WHEN ${Tables.BuySql} THEN value ELSE 0.0 END)
       |     - sum(CASE WHEN ${Tables.BuySql} THEN 0.0 ELSE value END))
       |    / nullif(sum(CASE WHEN ${Tables.BuySql} THEN value ELSE 0.0 END)
       |             + sum(CASE WHEN ${Tables.BuySql} THEN 0.0 ELSE value END), 0.0),
       |    -1.0), 1.0), 0.0) AS cvd
       |  FROM events GROUP BY 1),
       |imbq AS (${Book.imbalanceSql}),
       |wallq AS (${Book.wallSql}),
       |touchq AS (${Book.touchSql}),
       |lvq AS (${Flow.lvSql}),
       |vrq AS (${Flow.volRateSql}),
       |bosq AS (${LongMemory.bosSql}),
       |hq AS (${LongMemory.hurstSql}),
       |grpq AS (SELECT bucket,
       |    (row_number() OVER (ORDER BY bucket) - 1) // ${LongMemory.HurstN} AS grp
       |  FROM (${Bars.ohlcSql}) ob),
       |hurstq AS (SELECT grpq.bucket, hq.hurst FROM grpq LEFT JOIN hq USING (grp)),
       |sig AS (
       |  SELECT atr.bucket, atr.close, atr.atr_pct, zh.z, cvdh.cvd,
       |         imbq.imbalance, wallq.bid_wall, wallq.ask_wall,
       |         touchq.bid_touch_ok, touchq.ask_touch_ok,
       |         lvq.lv_1h, vrq.vol_factor, bosq.bos, hurstq.hurst
       |  FROM atr
       |  LEFT JOIN zh ON zh.bucket = atr.bucket
       |  LEFT JOIN cvdh ON cvdh.bucket = atr.bucket
       |  LEFT JOIN imbq ON imbq.bucket = atr.bucket
       |  LEFT JOIN wallq ON wallq.bucket = atr.bucket
       |  LEFT JOIN touchq ON touchq.bucket = atr.bucket
       |  LEFT JOIN lvq ON lvq.bucket = atr.bucket
       |  LEFT JOIN vrq ON vrq.bucket = atr.bucket
       |  LEFT JOIN bosq ON bosq.bucket = atr.bucket
       |  LEFT JOIN hurstq ON hurstq.bucket = atr.bucket)""".stripMargin

  /** All scoring columns on top of the signal frame. `private[graft]`:
    * ScoringSpec asserts the pure-scalar twin ([[graft.state.Scoring]])
    * produces identical numbers on identical inputs. */
  private[graft] def scored(df: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    val z0 = coalesce($"z", lit(0.0))
    val cvd0 = coalesce($"cvd", lit(0.0))
    val imb0 = coalesce($"imbalance", lit(0.0))
    val bos0 = coalesce($"bos", lit(0.0))
    val bw0 = coalesce($"bid_wall", lit(0.0))
    val aw0 = coalesce($"ask_wall", lit(0.0))
    val touchL = when(coalesce($"bid_touch_ok", lit(false)), 1.0).otherwise(0.0)
    val touchS = when(coalesce($"ask_touch_ok", lit(false)), 1.0).otherwise(0.0)

    def core(zS: Column, wallC: Column, imbS: Column, touchC: Column) =
      lit(0.25) * squash(imbS, lit(ImbGate)) +
        lit(0.20) * squash(wallC, $"wall_gate") +
        lit(0.30) * squash(zS, $"z_gate") +
        lit(0.10) * touchC +
        lit(0.15) * squash(bos0, lit(0.5))

    def fused(mc: Column, bayes: Column) = {
      val rlTerm = when($"rl".isNotNull, lit(0.3) * $"rl").otherwise(lit(0.0))
      val wTot = when($"rl".isNotNull, lit(1.0)).otherwise(lit(0.7))
      (lit(0.4) * mc + lit(0.3) * bayes + rlTerm) / wTot
    }

    def kelly(p: Column) =
      ColFns.clamp((p * lit(KellyB) - (lit(1.0) - p)) / lit(KellyB), 0.0, KellyCap)

    df.withColumn("regime",
        when($"atr_pct" < AtrLow, "LOW")
          .when($"atr_pct" > AtrHigh, "HIGH")
          .otherwise("NEUTRAL"))
      .withColumn("z_gate",
        when($"regime" === "HIGH", ZGate + ZShift)
          .when($"regime" === "LOW", ZGate - ZShift)
          .otherwise(ZGate))
      .withColumn("wall_gate",
        when($"regime" === "HIGH", WallGateHigh).otherwise(WallGate))
      .withColumn("sigma_mc",
        greatest(coalesce($"atr_pct", lit(1.0)) / lit(10.0), lit(0.0001)))
      .withColumn("core_long", core(z0, bw0, imb0, touchL))
      .withColumn("core_short", core(-z0, aw0, -imb0, touchS))
      .withColumn("mc_long", ColFns.normCdf(cvd0 / $"sigma_mc"))
      .withColumn("mc_short", ColFns.normCdf(-cvd0 / $"sigma_mc"))
      .withColumn("bayes_long",
        ColFns.sigmoid(lit(2.5) * cvd0 + lit(1.5) * imb0 + bos0 +
          greatest($"hurst" - lit(0.5), lit(0.0))))
      .withColumn("bayes_short",
        ColFns.sigmoid(lit(-2.5) * cvd0 - lit(1.5) * imb0 + bos0 +
          greatest($"hurst" - lit(0.5), lit(0.0))))
      .withColumn("rl",
        when($"hurst".isNotNull,
          ColFns.clamp(lit(0.5) + (lit(0.5) - $"hurst"), 0.01, 0.99)))
      .withColumn("fused_long", fused($"mc_long", $"bayes_long"))
      .withColumn("fused_short", fused($"mc_short", $"bayes_short"))
      .withColumn("kelly_long", kelly($"fused_long"))
      .withColumn("kelly_short", kelly($"fused_short"))
      .withColumn("winprob_long",
        ColFns.clamp(lit(0.4) + lit(0.2) * z0 / lit(4.0) + lit(0.2) * cvd0 +
          lit(0.1) * bos0 +
          lit(0.1) * least(coalesce($"lv_1h", lit(0.0)) / lit(100.0), lit(1.0)),
          0.0, 1.0))
      .withColumn("winprob_short",
        ColFns.clamp(lit(0.4) - lit(0.2) * z0 / lit(4.0) - lit(0.2) * cvd0 +
          lit(0.1) * bos0 +
          lit(0.1) * least(coalesce($"lv_1h", lit(0.0)) / lit(100.0), lit(1.0)),
          0.0, 1.0))
      .withColumn("total_long",
        lit(0.65) * $"core_long" + lit(0.35) * $"fused_long")
      .withColumn("total_short",
        lit(0.65) * $"core_short" + lit(0.35) * $"fused_short")
      .withColumn("entry_long",
        $"total_long" > EntryTotal && $"winprob_long" > EntryWinprob)
      .withColumn("entry_short",
        $"total_short" > EntryTotal && $"winprob_short" > EntryWinprob)
      .withColumn("side",
        when($"entry_long", "LONG").when($"entry_short", "SHORT")
          .otherwise("NONE"))
  }

  // SQL twins of every score expression, same op order / literals.
  private val z0 = "coalesce(z, 0.0)"
  private val cvd0 = "coalesce(cvd, 0.0)"
  private val imb0 = "coalesce(imbalance, 0.0)"
  private val bos0 = "coalesce(bos, 0.0)"
  private def coreSql(zS: String, wallC: String, imbS: String, touchC: String) =
    s"""0.25 * ${squashSql(imbS, ImbGate.toString)} +
       |    0.20 * ${squashSql(wallC, "wall_gate")} +
       |    0.30 * ${squashSql(zS, "z_gate")} +
       |    0.10 * $touchC +
       |    0.15 * ${squashSql(bos0, "0.5")}""".stripMargin
  private def fusedSql(mc: String, bayes: String) =
    s"""(0.4 * $mc + 0.3 * $bayes +
       |   CASE WHEN rl IS NOT NULL THEN 0.3 * rl ELSE 0.0 END)
       | / (CASE WHEN rl IS NOT NULL THEN 1.0 ELSE 0.7 END)""".stripMargin
  private def kellySql(p: String) =
    ColFns.clampSql(s"(($p) * $KellyB - (1.0 - ($p))) / $KellyB", 0.0, KellyCap)

  /** The whole scoring cascade as SQL against ANY input CTE exposing the
    * signal columns (atr_pct, z, cvd, imbalance, walls, touch flags,
    * lv_1h, bos, hurst + whatever should ride along, e.g. symbol): the
    * single-symbol `fusion_scores` oracle and the multi-symbol
    * `fused_multi` oracle share this text, so the cascade formulas exist
    * exactly once on the SQL side too. */
  private[operators] def cascadeSql(from: String): String =
    s"""g AS (
       |  SELECT *,
       |    CASE WHEN atr_pct < $AtrLow THEN 'LOW'
       |         WHEN atr_pct > $AtrHigh THEN 'HIGH'
       |         ELSE 'NEUTRAL' END AS regime
       |  FROM $from),
       |g2 AS (
       |  SELECT *,
       |    CASE WHEN regime = 'HIGH' THEN ${ZGate + ZShift}
       |         WHEN regime = 'LOW' THEN ${ZGate - ZShift}
       |         ELSE $ZGate END AS z_gate,
       |    CASE WHEN regime = 'HIGH' THEN $WallGateHigh ELSE $WallGate END AS wall_gate,
       |    greatest(coalesce(atr_pct, 1.0) / 10.0, 0.0001) AS sigma_mc
       |  FROM g),
       |g3 AS (
       |  SELECT *,
       |    ${coreSql(z0, "coalesce(bid_wall, 0.0)", imb0,
      "CASE WHEN coalesce(bid_touch_ok, false) THEN 1.0 ELSE 0.0 END")} AS core_long,
       |    ${coreSql(s"-$z0", "coalesce(ask_wall, 0.0)", s"-$imb0",
      "CASE WHEN coalesce(ask_touch_ok, false) THEN 1.0 ELSE 0.0 END")} AS core_short,
       |    ${ColFns.normCdfSql(s"$cvd0 / sigma_mc")} AS mc_long,
       |    ${ColFns.normCdfSql(s"-$cvd0 / sigma_mc")} AS mc_short,
       |    ${ColFns.sigmoidSql(s"2.5 * $cvd0 + 1.5 * $imb0 + $bos0 + greatest(hurst - 0.5, 0.0)")} AS bayes_long,
       |    ${ColFns.sigmoidSql(s"-2.5 * $cvd0 - 1.5 * $imb0 + $bos0 + greatest(hurst - 0.5, 0.0)")} AS bayes_short,
       |    CASE WHEN hurst IS NOT NULL
       |         THEN ${ColFns.clampSql("0.5 + (0.5 - hurst)", 0.01, 0.99)} END AS rl
       |  FROM g2),
       |g4 AS (
       |  SELECT *,
       |    ${fusedSql("mc_long", "bayes_long")} AS fused_long,
       |    ${fusedSql("mc_short", "bayes_short")} AS fused_short,
       |    ${ColFns.clampSql(
      s"0.4 + 0.2 * $z0 / 4.0 + 0.2 * $cvd0 + 0.1 * $bos0 + 0.1 * least(coalesce(lv_1h, 0.0) / 100.0, 1.0)",
      0.0, 1.0)} AS winprob_long,
       |    ${ColFns.clampSql(
      s"0.4 - 0.2 * $z0 / 4.0 - 0.2 * $cvd0 + 0.1 * $bos0 + 0.1 * least(coalesce(lv_1h, 0.0) / 100.0, 1.0)",
      0.0, 1.0)} AS winprob_short
       |  FROM g3),
       |g5 AS (
       |  SELECT *,
       |    ${kellySql("fused_long")} AS kelly_long,
       |    ${kellySql("fused_short")} AS kelly_short,
       |    0.65 * core_long + 0.35 * fused_long AS total_long,
       |    0.65 * core_short + 0.35 * fused_short AS total_short
       |  FROM g4),
       |g6 AS (
       |  SELECT *,
       |    total_long > $EntryTotal AND winprob_long > $EntryWinprob AS entry_long,
       |    total_short > $EntryTotal AND winprob_short > $EntryWinprob AS entry_short
       |  FROM g5)
       |SELECT *,
       |  CASE WHEN entry_long THEN 'LONG' WHEN entry_short THEN 'SHORT'
       |       ELSE 'NONE' END AS side
       |FROM g6""".stripMargin

  private[operators] val scoredSql: String =
    s"""WITH $signalsSql,
       |${cascadeSql("sig")}""".stripMargin

  /** The scored frame is the shared input of five queries (fusion,
    * entries, sizing, and the FSM-derived tables). Memoized + persisted
    * per (session, dir): ~720 rows at sf0.01, materialized once per
    * session instead of re-running the ten-join pipeline per query. */
  private[operators] def scoredShared(spark: SparkSession, dir: String): DataFrame =
    graft.functions.DfMemo.cached(spark, s"scored:$dir")(
      scored(signalsDf(spark, dir), spark))

  private val outCols = Seq("bucket", "close", "regime", "z", "cvd",
    "imbalance", "bid_wall", "ask_wall", "bos", "hurst", "atr_pct",
    "core_long", "core_short", "mc_long", "mc_short", "bayes_long",
    "bayes_short", "rl", "fused_long", "fused_short", "kelly_long",
    "kelly_short", "winprob_long", "winprob_short", "total_long",
    "total_short", "entry_long", "entry_short", "side")

  private def fusionDf(spark: SparkSession, dir: String): DataFrame =
    scoredShared(spark, dir).select(outCols.map(col): _*)

  private val fusionSql: String =
    s"""SELECT ${outCols.mkString(", ")} FROM ($scoredSql) q""".stripMargin

  private def entriesDf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    scoredShared(spark, dir)
      .filter(col("side") =!= "NONE")
      .select(col("bucket"), col("close"), col("side"),
        when(col("side") === "LONG", col("total_long"))
          .otherwise(col("total_short")).as("total"),
        when(col("side") === "LONG", col("winprob_long"))
          .otherwise(col("winprob_short")).as("winprob"),
        when(col("side") === "LONG", col("kelly_long"))
          .otherwise(col("kelly_short")).as("kelly"))
  }

  private val entriesSql: String =
    s"""SELECT bucket, close, side,
       |  CASE WHEN side = 'LONG' THEN total_long ELSE total_short END AS total,
       |  CASE WHEN side = 'LONG' THEN winprob_long ELSE winprob_short END AS winprob,
       |  CASE WHEN side = 'LONG' THEN kelly_long ELSE kelly_short END AS kelly
       |FROM ($scoredSql) q WHERE side <> 'NONE'""".stripMargin

  // Position sizing (risk_manager.py:148-174, config.py:23-26): margin =
  // clamp(balance*pct, 4, 10000) with the regime-dependent pct
  // (config.py:144-155: 15% in HIGH vol, else 20%); qty = round(margin *
  // leverage / price, 6) floored at the 0.001 min lot.
  val Balance = 10000.0
  val Leverage = 10.0

  private def sizingDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scoredShared(spark, dir)
      .filter($"side" =!= "NONE")
      .withColumn("pct",
        when($"regime" === "HIGH", 0.15).otherwise(0.20))
      .withColumn("margin",
        ColFns.clamp(lit(Balance) * $"pct", 4.0, 10000.0))
      .withColumn("qty",
        greatest(round($"margin" * Leverage / $"close", 6), lit(0.001)))
      .select($"bucket", $"side", $"regime", $"close", $"pct", $"margin",
        $"qty")
  }

  private val sizingSql: String =
    s"""SELECT bucket, side, regime, close,
       |  CASE WHEN regime = 'HIGH' THEN 0.15 ELSE 0.20 END AS pct,
       |  ${ColFns.clampSql(
        s"$Balance * (CASE WHEN regime = 'HIGH' THEN 0.15 ELSE 0.20 END)",
        4.0, 10000.0)} AS margin,
       |  greatest(round(${ColFns.clampSql(
        s"$Balance * (CASE WHEN regime = 'HIGH' THEN 0.15 ELSE 0.20 END)",
        4.0, 10000.0)} * $Leverage / close, 6), 0.001) AS qty
       |FROM ($scoredSql) q WHERE side <> 'NONE'""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fusion_scores" -> (fusionDf(_, _)),
    "entry_signals" -> (entriesDf(_, _)),
    "position_sizing" -> (sizingDf(_, _))
  )

  val oracles: Map[String, String] = Map(
    "fusion_scores" -> fusionSql,
    "entry_signals" -> entriesSql,
    "position_sizing" -> sizingSql
  )
}
