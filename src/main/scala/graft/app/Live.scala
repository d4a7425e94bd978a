package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.state.Fsm.FsmIn
import graft.streaming.Streams
import graft.streaming.Streams.Trade

/** Live-mode wiring (SURVEY §7.1, EP1): the streaming pipeline as four
  * always-on queries over a file-source trade feed (swap the source for
  * kafka in production — everything downstream is source-agnostic):
  *
  *  1. bars: watermarked 1-minute OHLC -> parquet append (the candle
  *     buffer, persisted instead of deque'd)
  *  2. deltas: watermarked 10 s taker-delta -> parquet append (the
  *     Parameters-table feed)
  *  3. signals: the bronze->silver hop — rolling z + entry signal kept
  *     incrementally over the delta table
  *  4. trades: the position FSM over a signal feed -> parquet append
  *     (the Trades table), with an idempotent foreachBatch that also
  *     refreshes the day-keyed summary (zscore_excel_logger.py:387-415's
  *     update-or-append row, recomputed from the source of truth)
  *
  * Every query checkpoints independently; restart-with-state is covered
  * by the checkpoint-recovery spec. NOTE on schema evolution: the state
  * store validates its schema, so changing PosState (as the trailing-stop
  * commit did) requires a fresh checkpoint — standard Structured
  * Streaming practice, called out here because it bit once.
  */
object Live {

  def tradeSource(spark: SparkSession, dir: String) =
    spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Trade].schema)
      .parquet(dir).as[Trade](org.apache.spark.sql.Encoders.product[Trade])

  def signalSource(spark: SparkSession, dir: String) = {
    // read trail_arm as nullable and default it: signal files written
    // before the trailing-stop field existed must keep replaying (the
    // non-nullable encoder schema would throw on their nulls)
    val enc = org.apache.spark.sql.Encoders.product[FsmIn]
    val relaxed = org.apache.spark.sql.types.StructType(
      enc.schema.map(f =>
        if (f.name == "trail_arm") f.copy(nullable = true) else f))
    spark.readStream.schema(relaxed).parquet(dir)
      .withColumn("trail_arm",
        coalesce(col("trail_arm"), lit(false)))
      .as[FsmIn](enc)
  }

  def barsQuery(spark: SparkSession, tradesDir: String, outDir: String,
      ckptDir: String): StreamingQuery =
    Streams.ohlcBars(tradeSource(spark, tradesDir))
      .writeStream.format("parquet")
      .option("path", s"$outDir/bars")
      .option("checkpointLocation", s"$ckptDir/bars")
      .outputMode("append").start()

  def deltaQuery(spark: SparkSession, tradesDir: String, outDir: String,
      ckptDir: String): StreamingQuery =
    Streams.takerDelta(tradeSource(spark, tradesDir))
      .writeStream.format("parquet")
      .option("path", s"$outDir/deltas")
      .option("checkpointLocation", s"$ckptDir/deltas")
      .outputMode("append").start()

  /** Rename-aside swap of a recomputed table. The replacement is fully
    * written aside before the old table moves; the only unavailable
    * window is the instant between the two renames, and a crash there is
    * healed by the restore at the top of the NEXT refresh (dst missing +
    * backup present -> restore backup first). Driver-local java.io
    * (demo-grade; production writes a transactional table format). */
  private def swapInPlace(outDir: String, table: String,
      df: DataFrame): Unit = {
    val dst = new java.io.File(s"$outDir/$table")
    val old = new java.io.File(s"$outDir/.${table}_old")
    val tmp = new java.io.File(s"$outDir/.${table}_tmp")
    if (!dst.exists() && old.exists()) old.renameTo(dst) // heal prior crash
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    if (old.exists()) graft.functions.Fs.deleteRecursively(old)
    if (dst.exists() && !dst.renameTo(old))
      throw new java.io.IOException(s"$table swap failed: $dst -> $old")
    if (!tmp.renameTo(dst)) {
      if (old.exists()) old.renameTo(dst) // restore; heal on next batch
      throw new java.io.IOException(s"$table swap failed: $tmp -> $dst")
    }
    if (old.exists()) graft.functions.Fs.deleteRecursively(old)
  }

  /** Recompute the day-keyed summary from the trades table (the source
    * of truth) and swap it into place. Deriving from the full table
    * instead of merging increments makes the summary self-healing under
    * replays: as long as the trades append is idempotent, any number of
    * recomputes converge. The schema is the full 12-column Daily Summary
    * (shared with the hash-checked `fsm_daily_summary` batch query via
    * [[graft.operators.Stateful.dailySummaryOf]]). */
  def refreshDailySummary(spark: SparkSession, outDir: String): Unit = {
    if (!new java.io.File(s"$outDir/trades").exists()) return
    swapInPlace(outDir, "daily_summary", graft.operators.Stateful
      .dailySummaryOf(
        spark.read.parquet(s"$outDir/trades").filter(col("action") === "EXIT")))
  }

  /** Recompute the orders table from the full trades table, same
    * source-of-truth pattern as the daily summary: the rate-limit rank
    * is computed over ALL events, so the cap holds per 60-bucket window
    * regardless of how events were split across micro-batches, and the
    * live table equals Backtest's batch orders table by construction. */
  def refreshOrders(spark: SparkSession, outDir: String): Unit = {
    if (!new java.io.File(s"$outDir/trades").exists()) return
    swapInPlace(outDir, "orders",
      ordersOf(spark.read.parquet(s"$outDir/trades")))
  }

  /** Idempotent append guard: every sink row carries its micro-batch id
    * and a replayed batch (same id already present) is skipped —
    * Structured Streaming re-runs a foreachBatch whose commit didn't
    * land, so the batchId is the dedup key (batch ids are monotone per
    * checkpoint). */
  private def committedIn(spark: SparkSession, tableDir: String,
      batchId: Long): Boolean = {
    val path = new java.io.File(tableDir)
    path.exists() && {
      val ids = spark.read.parquet(path.toString).select(col("batch_id"))
      !ids.filter(col("batch_id") === batchId).isEmpty
    }
  }

  def alreadyCommitted(spark: SparkSession, outDir: String,
      batchId: Long): Boolean = committedIn(spark, s"$outDir/trades", batchId)

  /** Max orders per rate window (reference config.py:56). */
  val RateLimitOrders = 20

  /** FSM events -> order actions (order_manager.py:152-209): ENTER places
    * a market order in the position direction, EXIT a reduce-only order
    * on the opposite side. The per-minute rate limiter
    * (order_manager.py:44-53) is applied declaratively: orders beyond the
    * cap within a 60-bucket window are flagged DEFERRED rather than
    * silently dropped — the replayable, auditable form of the reference's
    * sleep-and-retry. order_id is deterministic in (bucket, action, side)
    * so replays produce identical rows. */
  def ordersOf(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("rate_win"))
      .orderBy(col("bucket"), col("action"), col("side"))
    events
      .withColumn("order_side",
        when(col("action") === "ENTER",
          when(col("side") === "LONG", "BUY").otherwise("SELL"))
          .otherwise(when(col("side") === "LONG", "SELL").otherwise("BUY")))
      .withColumn("reduce_only", col("action") === "EXIT")
      .withColumn("order_id",
        concat_ws("-", col("bucket"), col("action"), col("side")))
      .withColumn("rate_win", expr("bucket div 60"))
      .withColumn("rn", row_number().over(w))
      .withColumn("status",
        when(col("rn") <= RateLimitOrders, "PLACED").otherwise("DEFERRED"))
      .select("order_id", "bucket", "action", "order_side", "reduce_only",
        "status")
  }

  /** Silver stage: tails the delta table the deltaQuery lands and keeps
    * the rolling z-score + entry signal incrementally — the
    * bronze(deltas) -> silver(signals) hop of the live topology. */
  def signalQuery(spark: SparkSession, outDir: String,
      ckptDir: String): StreamingQuery = {
    import spark.implicits._
    val deltas = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Streams.DeltaRow].schema)
      .parquet(s"$outDir/deltas")
      .as[Streams.DeltaRow]
    Streams.zscoreStream(deltas)
      .writeStream.format("parquet")
      .option("path", s"$outDir/signals")
      .option("checkpointLocation", s"$ckptDir/signals")
      .outputMode("append").start()
  }

  def bookSource(spark: SparkSession, dir: String) =
    spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Streams.BookLevel].schema)
      .parquet(dir)
      .as[Streams.BookLevel](
        org.apache.spark.sql.Encoders.product[Streams.BookLevel])

  /** The fully incremental fused decision stream (EP1): the raw trade
    * feed and (when a book feed exists) the book-update feed union into
    * ONE windowed aggregation — one shuffle on the (window, symbol) key
    * — then one keyed-state fold: every signal family including the
    * book trio and the aether components, the full fused cascade, the
    * entry side, and the FSM events land per finalized bar in the
    * `fused` table. Spark 4 chains the stateful operators in a single
    * query, so this needs no bronze hop. */
  def fusedQuery(spark: SparkSession, tradesDir: String, outDir: String,
      ckptDir: String, booksDir: Option[String] = None): StreamingQuery = {
    val trades = tradeSource(spark, tradesDir)
    val bars = booksDir match {
      case Some(bd) =>
        Streams.signalBarsWithBook(trades, bookSource(spark, bd))
      case None => Streams.signalBars(trades)
    }
    Streams.fusedStream(bars)
      .writeStream.format("parquet")
      .option("path", s"$outDir/fused")
      .option("checkpointLocation", s"$ckptDir/fused")
      .outputMode("append").start()
  }

  def tradesQuery(spark: SparkSession, signalsDir: String, outDir: String,
      ckptDir: String): StreamingQuery = {
    import spark.implicits._
    Streams.positionEvents(signalSource(spark, signalsDir))
      .writeStream
      .option("checkpointLocation", s"$ckptDir/trades")
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.state.Fsm.FsmEvent], batchId: Long) =>
        val df = batch.toDF().withColumn("batch_id", lit(batchId)).cache()
        try {
          if (!df.isEmpty && !alreadyCommitted(spark, outDir, batchId)) {
            df.write.mode("append").parquet(s"$outDir/trades")
          }
          // unconditional (idempotent recomputes from the source of
          // truth): a crash between the append and a refresh must not
          // leave the derived tables stale until some future non-empty
          // batch. Orders derive here too (closing the EP1 loop) so the
          // trades and orders tables can never be mutually inconsistent.
          refreshDailySummary(spark, outDir)
          refreshOrders(spark, outDir)
        } finally df.unpersist()
        ()
      }
      .start()
  }

  def main(args: Array[String]): Unit = {
    // 4-arg: trade-only; optional 5th arg: a book-update feed directory
    val Array(tradesDir, signalsDir, outDir, ckptDir) = args.take(4)
    val booksDir = args.drop(4).headOption
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the silver stage tails the delta table; make sure its source dir
    // exists before the file source initializes
    new java.io.File(s"$outDir/deltas").mkdirs()
    val qs = Seq(
      barsQuery(spark, tradesDir, outDir, ckptDir),
      deltaQuery(spark, tradesDir, outDir, ckptDir),
      signalQuery(spark, outDir, ckptDir),
      fusedQuery(spark, tradesDir, outDir, ckptDir, booksDir),
      tradesQuery(spark, signalsDir, outDir, ckptDir))
    qs.foreach(_.awaitTermination())
  }
}
