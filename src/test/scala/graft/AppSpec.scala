package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.app.{Backtest, Live}
import graft.state.Fsm.FsmIn
import graft.streaming.Streams.Trade

/** End-to-end app wiring: batch backtest writes every result table;
  * live-mode queries land bars/deltas/trades and keep the day-keyed
  * summary upserted across micro-batches. */
class AppSpec extends SparkSpec {

  test("backtest writes all result tables") {
    val out = Files.createTempDirectory("graft_bt").toString
    Backtest.run(spark, sfDir(), out)
    (Backtest.ResultTables :+ "orders").foreach { t =>
      val df = spark.read.parquet(s"$out/$t")
      assert(df.count() > 0, s"$t empty")
    }
    // one order per FSM event, mapped by the shared Live.ordersOf rule
    assert(spark.read.parquet(s"$out/orders").count() ==
      spark.read.parquet(s"$out/fsm_position_events").count())
  }

  private def eventDf(rows: Seq[(Long, String, String, Long, Double,
      Option[Double], Option[Double], Option[String], String)]) = {
    import spark.implicits._
    rows.toDF("bucket", "action", "side", "entry_bucket", "entry_price",
      "exit_price", "pnl", "reason", "symbol")
  }

  test("trades sink replay protection: O(1) commit detection, idempotent incremental refresh") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_idem").toString
    val b0 = eventDf(Seq(
      (2L, "EXIT", "LONG", 1L, 100.0, Some(104.0), Some(4.0), Some("TP_HIT"), "SYM")))
    val b1 = eventDf(Seq(
      (30L, "EXIT", "SHORT", 29L, 50.0, Some(48.0), Some(2.0), Some("TP_HIT"), "SYM")))
    Live.commitBatch(b0, out, 0L)
    Live.commitBatch(b1, out, 1L)
    assert(Live.alreadyCommitted(spark, out, 0L))
    assert(Live.alreadyCommitted(spark, out, 1L))
    assert(!Live.alreadyCommitted(spark, out, 2L))
    // refresh consumes ONLY the batch; re-running the same batch id is a
    // no-op (the per-day last_batch watermark absorbs healed replays)
    Live.refreshDailySummary(spark, out, b0, 0L)
    Live.refreshDailySummary(spark, out, b1, 1L)
    Live.refreshDailySummary(spark, out, b1, 1L)
    val summary = spark.read.parquet(s"$out/daily_summary")
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("n_trades"))
      .toMap
    assert(summary == Map(0L -> 1L, 1L -> 1L))
    // orders refresh is idempotent the same way (deduped event keys)
    Live.refreshOrders(spark, out, b0, 0L)
    Live.refreshOrders(spark, out, b0, 0L)
    assert(spark.read.parquet(s"$out/orders").count() == 1)
  }

  test("two-writer fencing: a second writer fences the first; no batch lost or double-applied") {
    import graft.app.BatchSink
    val out = Files.createTempDirectory("graft_fence").toString
    val dir = s"$out/trades"
    val key = Seq("bucket", "symbol")
    val rowsA0 = eventDf(Seq(
      (2L, "EXIT", "LONG", 1L, 100.0, Some(104.0), Some(4.0), Some("TP_HIT"), "SYM")))
    val rowsB0 = eventDf(Seq(
      (30L, "EXIT", "SHORT", 29L, 50.0, Some(48.0), Some(2.0), Some("TP_HIT"), "SYM")))
    val rowsA1 = eventDf(Seq(
      (40L, "EXIT", "LONG", 39L, 70.0, Some(71.0), Some(1.0), Some("TP_HIT"), "SYM")))
    // writer A holds the lease and lands batch 0
    val leaseA = BatchSink.acquireWriter(dir)
    BatchSink.commitFenced(rowsA0, leaseA, 0L)
    assert(BatchSink.alreadyCommitted(dir, 0L))
    // writer B acquires: FENCES A (a restart or a mistakenly-launched
    // duplicate job), then lands its own batch 1
    val leaseB = BatchSink.acquireWriter(dir)
    BatchSink.commitFenced(rowsB0, leaseB, 1L)
    // the interleaved commit: stale A tries to land batch 2 — refused
    // BEFORE touching the table
    val ex = intercept[BatchSink.ConcurrentWriterException] {
      BatchSink.commitFenced(rowsA1, leaseA, 2L)
    }
    assert(ex.getMessage.contains("fenced"))
    assert(!BatchSink.alreadyCommitted(dir, 2L),
      "the fenced writer's refused batch must not look committed")
    // stale A must not overwrite a batch the live writer owns either
    intercept[BatchSink.ConcurrentWriterException] {
      BatchSink.commitFenced(rowsA1, leaseA, 1L)
    }
    // no committed batch lost, none double-applied: exactly A's batch 0
    // and B's batch 1 survive, each once
    val table = BatchSink.read(spark, dir, key).get.collect()
    assert(table.length == 2)
    assert(table.map(_.getAs[Long]("bucket")).toSet == Set(2L, 30L))
    // the epoch survives compaction and read paths untouched
    assert(BatchSink.currentEpoch(dir) == leaseB.epoch)
    // B keeps writing under its live lease
    BatchSink.commitFenced(rowsA1, leaseB, 2L)
    assert(BatchSink.read(spark, dir, key).get.count() == 3)
  }

  test("derived-table refresh never touches the trades table (per-batch work is O(batch))") {
    val out = Files.createTempDirectory("graft_nobase").toString
    // NO trades table exists in this outDir: the refreshes must still
    // work because they read only the batch rows + their own tables —
    // the structural proof that per-batch work cannot scale with
    // accumulated trades history
    val b = eventDf(Seq(
      (2L, "EXIT", "LONG", 1L, 100.0, Some(104.0), Some(4.0), Some("TP_HIT"), "SYM"),
      (5L, "ENTER", "SHORT", 5L, 99.0, None, None, None, "SYM")))
    Live.refreshDailySummary(spark, out,
      b.filter(org.apache.spark.sql.functions.col("action") === "EXIT"), 7L)
    Live.refreshOrders(spark, out, b, 7L)
    assert(spark.read.parquet(s"$out/daily_summary").count() == 1)
    assert(spark.read.parquet(s"$out/orders").count() == 2)
    assert(!new java.io.File(s"$out/trades").exists())
  }

  test("live multi-symbol: keyed FSM folds per symbol into one trades table, global rate rank") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_msym").toString
    val signalsDir = s"$base/signals_in"
    val outDir = s"$base/out"
    // two symbols' signals interleaved in one feed: A opens and TP-closes;
    // B opens and SL-closes — each fold must see only its own rows
    Seq(
      FsmIn(1, 100.0, 100.0, 100.0, "LONG", 1.0, 1.0, symbol = "A"),
      FsmIn(1, 50.0, 50.0, 50.0, "SHORT", 1.0, 1.0, symbol = "B"),
      FsmIn(2, 105.0, 105.0, 100.0, "NONE", 1.0, 1.0, symbol = "A"), // A TP
      FsmIn(2, 50.5, 51.5, 50.0, "NONE", 1.0, 1.0, symbol = "B"))    // B SL
      .toDS().coalesce(1).write.mode("append").parquet(signalsDir)
    val q = Live.tradesQuery(spark, signalsDir, outDir, s"$base/ckpt")
    q.processAllAvailable()
    q.stop()
    val trades = spark.read.parquet(s"$outDir/trades")
    val bySym = trades.collect()
      .groupBy(_.getAs[String]("symbol"))
      .view.mapValues(_.map(r =>
        r.getAs[String]("action") -> r.getAs[String]("side")).toSet).toMap
    assert(bySym("A") == Set("ENTER" -> "LONG", "EXIT" -> "LONG"))
    assert(bySym("B") == Set("ENTER" -> "SHORT", "EXIT" -> "SHORT"))
    assert(trades.filter($"action" === "EXIT" && $"symbol" === "A")
      .head.getAs[String]("reason") == "TP_HIT")
    assert(trades.filter($"action" === "EXIT" && $"symbol" === "B")
      .head.getAs[String]("reason") == "SL_HIT")
    // orders: symbol-qualified deterministic ids; the rate-limit rank is
    // ACCOUNT-level, so all four land in one rate window and all place
    val orders = spark.read.parquet(s"$outDir/orders").collect()
    assert(orders.length == 4)
    assert(orders.map(_.getAs[String]("order_id")).toSet ==
      Set("A-1-ENTER-LONG", "A-2-EXIT-LONG", "B-1-ENTER-SHORT", "B-2-EXIT-SHORT"))
    assert(orders.forall(_.getAs[String]("status") == "PLACED"))
    // the daily summary aggregates ACROSS symbols (account-level day row)
    val summary = spark.read.parquet(s"$outDir/daily_summary").collect()
    assert(summary.length == 1 && summary.head.getAs[Long]("n_trades") == 2L)
  }

  test("orders partition heal: a swap crashed between renames loses no prior orders") {
    val out = Files.createTempDirectory("graft_oswap").toString
    val b0 = eventDf(Seq(
      (2L, "EXIT", "LONG", 1L, 100.0, Some(104.0), Some(4.0), Some("TP_HIT"), "SYM")))
    Live.refreshOrders(spark, out, b0, 0L)
    // simulate the crash point between backup-rename and new-dir-rename:
    // the window's only committed copy sits in the dot-backup directory
    val dir = new java.io.File(s"$out/orders")
    assert(new java.io.File(dir, "rate_win=0")
      .renameTo(new java.io.File(dir, ".rate_win=0_old")))
    // the next batch touches the same window: the heal must restore the
    // backup BEFORE the prior read, or b0's order would vanish
    val b1 = eventDf(Seq(
      (5L, "ENTER", "SHORT", 5L, 99.0, None, None, None, "SYM")))
    Live.refreshOrders(spark, out, b1, 1L)
    val ids = spark.read.parquet(s"$out/orders").collect()
      .map(_.getAs[String]("order_id")).toSet
    assert(ids == Set("SYM-2-EXIT-LONG", "SYM-5-ENTER-SHORT"))
    // no backup directories survive a completed refresh
    assert(!dir.listFiles().exists(_.getName.endsWith("_old")))
  }

  test("trades compaction: old batches fold into the day archive, replay guard survives") {
    val out = Files.createTempDirectory("graft_compact").toString
    // six committed micro-batches spanning three days (bucket div 24)
    (0 until 6).foreach { i =>
      val b = eventDf(Seq(
        (i * 13L, if (i % 2 == 0) "ENTER" else "EXIT", "LONG", i * 13L,
          100.0, Some(104.0), Some(4.0), Some("TP_HIT"), "SYM")))
      Live.commitBatch(b, out, i.toLong)
    }
    def keysOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[String]("action"))).toSet
    val before = keysOf(Live.readTrades(spark, out).get)
    assert(before.size == 6)
    Live.compactTrades(spark, out, keepBatches = 2)
    // cutoff = maxId - keep: batches 0..3 folded, 4 and 5 stay live
    val tradesDir = new java.io.File(s"$out/trades")
    val liveDirs = tradesDir.listFiles().map(_.getName).toSet
    assert(liveDirs == Set("batch_id=4", "batch_id=5"), s"saw $liveDirs")
    val archDays = new java.io.File(s"$out/trades_archive").listFiles()
      .map(_.getName).filter(_.startsWith("day=")).toSet
    assert(archDays == Set("day=0", "day=1"), s"saw $archDays")
    // the union view sees every row exactly once, before == after
    assert(keysOf(Live.readTrades(spark, out).get) == before)
    // replay guard: compacted ids answer via the ledger, recent via marker
    assert(Live.alreadyCommitted(spark, out, 0L))
    assert(Live.alreadyCommitted(spark, out, 3L))
    assert(Live.alreadyCommitted(spark, out, 5L))
    assert(!Live.alreadyCommitted(spark, out, 6L))
    // idempotent: a second run (nothing old enough) changes nothing
    Live.compactTrades(spark, out, keepBatches = 2)
    assert(keysOf(Live.readTrades(spark, out).get) == before)
    // crash window: a folded batch's source directory survives (crash
    // between the archive swap / ledger write and the source delete) —
    // its rows sit on BOTH sides, and the union view must not double-count
    val b0again = eventDf(Seq(
      (0L, "ENTER", "LONG", 0L, 100.0, Some(104.0), Some(4.0),
        Some("TP_HIT"), "SYM")))
    Live.commitBatch(b0again, out, 0L)
    val healed = Live.readTrades(spark, out).get
    assert(keysOf(healed) == before)
    assert(healed.count() == 6)
    // and the next compaction run converges: re-folds, deletes the dir
    Live.compactTrades(spark, out, keepBatches = 2)
    assert(!new java.io.File(s"$out/trades/batch_id=0").exists())
    assert(keysOf(Live.readTrades(spark, out).get) == before)
  }

  test("snapshot reads: as-of-batch time travel survives compaction") {
    val out = Files.createTempDirectory("graft_asof").toString
    (0 until 6).foreach { i =>
      val b = eventDf(Seq(
        (i * 13L, if (i % 2 == 0) "ENTER" else "EXIT", "LONG", i * 13L,
          100.0, Some(104.0), Some(4.0), Some("TP_HIT"), "SYM")))
      Live.commitBatch(b, out, i.toLong)
    }
    val dir = s"$out/trades"
    val key = graft.app.Live.EventKey
    def bucketsAsOf(b: Long): Set[Long] =
      graft.app.BatchSink.readAsOf(spark, dir, key, b)
        .map(_.collect().map(_.getAs[Long]("bucket")).toSet)
        .getOrElse(Set.empty)
    // pre-compaction: each snapshot sees exactly the batches <= its id
    assert(bucketsAsOf(2L) == Set(0L, 13L, 26L))
    assert(bucketsAsOf(5L) == (0 until 6).map(_ * 13L).toSet)
    assert(bucketsAsOf(-1L).isEmpty)
    // fold batches 0..3 into the day archive — provenance must survive
    Live.compactTrades(spark, out, keepBatches = 2)
    assert(bucketsAsOf(2L) == Set(0L, 13L, 26L),
      "time travel must survive the fold")
    assert(bucketsAsOf(3L) == Set(0L, 13L, 26L, 39L))
    assert(bucketsAsOf(100L) == (0 until 6).map(_ * 13L).toSet)
    // the snapshot keeps per-row provenance: every row's batch_id is
    // within the snapshot, archived rows included
    val snap = graft.app.BatchSink.readAsOf(spark, dir, key, 3L).get
    assert(snap.columns.contains("batch_id"))
    assert(snap.collect().forall(_.getAs[Long]("batch_id") <= 3L))
    // the present-time view is unchanged by provenance tracking: same
    // rows, no batch_id in the consumer schema
    val now = Live.readTrades(spark, out).get
    assert(!now.columns.contains("batch_id"))
    assert(now.count() == 6)
    // retention bounds time travel, like snapshot expiry: dropping
    // day 0 removes its rows from every snapshot
    assert(graft.app.BatchSink.expire(dir, minDay = 1) == 1)
    assert(bucketsAsOf(2L) == Set(26L), "expired days leave all snapshots")
  }

  test("archive heal: a compaction crashed between its two renames loses no archived rows") {
    val out = Files.createTempDirectory("graft_archheal").toString
    (0 until 6).foreach { i =>
      val b = eventDf(Seq(
        (i * 13L, if (i % 2 == 0) "ENTER" else "EXIT", "LONG", i * 13L,
          100.0, Some(104.0), Some(4.0), Some("TP_HIT"), "SYM")))
      Live.commitBatch(b, out, i.toLong)
    }
    def keysOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[String]("action"))).toSet
    val before = keysOf(Live.readTrades(spark, out).get)
    Live.compactTrades(spark, out, keepBatches = 2)
    // crash point: dst -> .day=0_old done, src -> dst not. The backup
    // holds the ONLY copy of day 0's archived rows; Spark's partition
    // discovery ignores dot-prefixed dirs, so an unhealed read would
    // silently drop the day — readTrades must heal before reading
    val arch = new java.io.File(s"$out/trades_archive")
    assert(new java.io.File(arch, "day=0")
      .renameTo(new java.io.File(arch, ".day=0_old")))
    assert(keysOf(Live.readTrades(spark, out).get) == before)
    assert(new java.io.File(arch, "day=0").exists())
    assert(!new java.io.File(arch, ".day=0_old").exists())
    // same crash healed by a compaction run with nothing new to fold
    // (the heal must sit ABOVE the early returns)
    assert(new java.io.File(arch, "day=1")
      .renameTo(new java.io.File(arch, ".day=1_old")))
    Live.compactTrades(spark, out, keepBatches = 2)
    assert(new java.io.File(arch, "day=1").exists())
    assert(keysOf(Live.readTrades(spark, out).get) == before)
  }

  test("read-committed: a half-written batch directory never leaks into the trades view") {
    val out = Files.createTempDirectory("graft_rc").toString
    val b0 = eventDf(Seq(
      (2L, "EXIT", "LONG", 1L, 100.0, Some(104.0), Some(4.0), Some("TP_HIT"), "SYM")))
    Live.commitBatch(b0, out, 0L)
    // batch 1 crashed mid-write: complete part files, no _SUCCESS
    val b1 = eventDf(Seq(
      (30L, "ENTER", "SHORT", 30L, 50.0, None, None, None, "SYM")))
    Live.commitBatch(b1, out, 1L)
    assert(new java.io.File(s"$out/trades/batch_id=1/_SUCCESS").delete())
    val seen = Live.readTrades(spark, out).get.collect()
      .map(_.getAs[Long]("bucket")).toSet
    assert(seen == Set(2L), s"uncommitted rows leaked: $seen")
    // the batch replays (overwrite into its own dir) and becomes visible
    Live.commitBatch(b1, out, 1L)
    assert(Live.readTrades(spark, out).get.count() == 2)
  }

  test("stray non-numeric batch directories never take the reader or compactor down") {
    val out = Files.createTempDirectory("graft_stray").toString
    val b0 = eventDf(Seq(
      (2L, "EXIT", "LONG", 1L, 100.0, Some(104.0), Some(4.0), Some("TP_HIT"), "SYM")))
    Live.commitBatch(b0, out, 0L)
    // an operator's manual copy: prefix matches, id does not parse, and
    // it even carries a _SUCCESS marker — the worst case for the filter
    val stray = new java.io.File(s"$out/trades/batch_id=0_backup")
    assert(stray.mkdirs())
    assert(new java.io.File(stray, "_SUCCESS").createNewFile())
    // read skips it instead of throwing NumberFormatException
    val seen = Live.readTrades(spark, out).get.collect()
      .map(_.getAs[Long]("bucket")).toSet
    assert(seen == Set(2L))
    // compaction likewise ignores it
    Live.compactTrades(spark, out, keepBatches = 1)
    assert(Live.readTrades(spark, out).get.count() == 1)
  }

  test("compaction respects the pending-refresh marker and clamps keepBatches to >= 1") {
    val out = Files.createTempDirectory("graft_pend").toString
    (0 until 6).foreach { i =>
      val b = eventDf(Seq(
        (i * 13L, "ENTER", "LONG", i * 13L, 100.0, None, None, None, "SYM")))
      Live.commitBatch(b, out, i.toLong)
    }
    // batch 2's refreshes never completed: its marker is still pending.
    // Folding it would delete the only input healPending can replay from
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out/.refresh_pending"), "2".getBytes)
    Live.compactTrades(spark, out, keepBatches = 2)
    val left = new java.io.File(s"$out/trades").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSet
    // only batches BELOW the marker folded; 2..5 all survive
    assert(left == Set("batch_id=2", "batch_id=3", "batch_id=4", "batch_id=5"),
      s"saw $left")
    // marker cleared: keepBatches=0 must still keep the newest batch —
    // it is the one Structured Streaming can replay, and its replay
    // guard depends on the _SUCCESS marker surviving un-folded
    new java.io.File(s"$out/.refresh_pending").delete()
    Live.compactTrades(spark, out, keepBatches = 0)
    val left2 = new java.io.File(s"$out/trades").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSet
    assert(left2 == Set("batch_id=5"), s"saw $left2")
    assert((0L to 5L).forall(Live.alreadyCommitted(spark, out, _)))
  }

  test("folded watermark stays O(1): one long, not a per-batch ledger") {
    val out = Files.createTempDirectory("graft_wm").toString
    (0 until 8).foreach { i =>
      val b = eventDf(Seq(
        (i * 13L, "ENTER", "LONG", i * 13L, 100.0, None, None, None, "SYM")))
      Live.commitBatch(b, out, i.toLong)
    }
    Live.compactTrades(spark, out, keepBatches = 2)
    assert(Live.foldedWatermark(out).contains(5L))
    val ledger = new java.io.File(s"$out/trades_archive/_compacted_batches")
    assert(new String(java.nio.file.Files.readAllBytes(ledger.toPath),
      "UTF-8").trim == "5")
    // a second compaction advances the single value — no accumulation
    val b8 = eventDf(Seq(
      (8 * 13L, "ENTER", "LONG", 8 * 13L, 100.0, None, None, None, "SYM")))
    Live.commitBatch(b8, out, 8L)
    Live.compactTrades(spark, out, keepBatches = 2)
    assert(new String(java.nio.file.Files.readAllBytes(ledger.toPath),
      "UTF-8").trim == "6")
    // legacy per-id ledgers (round-4 format) read as their max
    java.nio.file.Files.write(ledger.toPath, "0\n1\n2\n".getBytes)
    assert(Live.foldedWatermark(out).contains(2L))
  }

  test("signal source refuses legacy null-symbol rows mixed with a multi-symbol feed") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_symguard").toString
    def legacyRows(dir: String): Unit =
      Seq(FsmIn(1, 100.0, 100.0, 100.0, "LONG", 1.0, 1.0))
        .toDS().toDF()
        .withColumn("symbol",
          org.apache.spark.sql.functions.lit(null).cast("string"))
        .coalesce(1).write.mode("append").parquet(dir)
    // legacy rows alone (single-symbol deployment): backfill is sound
    val single = s"$base/single"
    legacyRows(single)
    Seq(FsmIn(2, 100.0, 100.0, 100.0, "NONE", 1.0, 1.0, symbol = "SYM"))
      .toDS().coalesce(1).write.mode("append").parquet(single)
    Live.signalSource(spark, single) // must not throw
    // legacy rows + two real symbols: the "SYM" backfill would merge
    // every legacy row into one FSM key — refuse loudly
    val multi = s"$base/multi"
    legacyRows(multi)
    Seq(FsmIn(2, 100.0, 100.0, 100.0, "NONE", 1.0, 1.0, symbol = "A"),
        FsmIn(2, 50.0, 50.0, 50.0, "NONE", 1.0, 1.0, symbol = "B"))
      .toDS().coalesce(1).write.mode("append").parquet(multi)
    val e = intercept[IllegalStateException] {
      Live.signalSource(spark, multi)
    }
    assert(e.getMessage.contains("legacy null-symbol"))
  }

  test("crash healing: an uncleared pending marker replays the refresh from the batch partition") {
    val out = Files.createTempDirectory("graft_heal").toString
    val b = eventDf(Seq(
      (2L, "EXIT", "LONG", 1L, 100.0, Some(104.0), Some(4.0), Some("TP_HIT"), "SYM")))
    // simulate a crash after the append but before any refresh ran
    Live.commitBatch(b, out, 3L)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out/.refresh_pending"), "3".getBytes)
    Live.healPending(spark, out)
    assert(!new java.io.File(s"$out/.refresh_pending").exists())
    assert(spark.read.parquet(s"$out/daily_summary").count() == 1)
    assert(spark.read.parquet(s"$out/orders").count() == 1)
    // healing again (marker re-appears, refresh already applied) no-ops
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out/.refresh_pending"), "3".getBytes)
    Live.healPending(spark, out)
    assert(spark.read.parquet(s"$out/daily_summary")
      .head.getAs[Long]("n_trades") == 1L)
  }

  test("windowed sinks: batch partitions stay bounded under compaction, readers see identical rows") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sinkcompact").toString
    val tradesDir = s"$base/trades_in"
    val outDir = s"$base/out"
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    new java.io.File(tradesDir).mkdirs() // file source needs the dir up front
    val q = Live.deltaQuery(spark, tradesDir, outDir, s"$base/ckpt")
    // five micro-batches, each a day apart so the watermark finalizes
    // the prior day's windows into a committed batch partition
    (0 until 5).foreach { i =>
      Seq(Trade("S", ts(i * 86400L + 1), 10.0 + i, 1.0, i % 2 == 0),
          Trade("S", ts(i * 86400L + 2000), 11.0, 1.0, false))
        .toDS().coalesce(1).write.mode("append").parquet(tradesDir)
      q.processAllAvailable()
    }
    q.stop()
    def batchDirs() = Option(new java.io.File(s"$outDir/deltas").listFiles())
      .getOrElse(Array.empty[java.io.File])
      .count(_.getName.startsWith("batch_id="))
    def rowsOfSink() = Live.readSink(spark, outDir, "deltas").get
      .collect()
      .map(r => (r.getAs[Timestamp]("win_start"), r.getAs[Double]("delta")))
      .toSet
    val dirsBefore = batchDirs()
    assert(dirsBefore >= 3, s"expected several micro-batch dirs, saw $dirsBefore")
    val before = rowsOfSink()
    assert(before.nonEmpty)
    // compaction bounds the partition count; the union view is unchanged
    Live.compactSinks(spark, outDir, keepBatches = 1)
    assert(batchDirs() <= 2, s"batch dirs not bounded: ${batchDirs()}")
    assert(new java.io.File(s"$outDir/deltas_archive").listFiles()
      .exists(_.getName.startsWith("day=")))
    assert(rowsOfSink() == before)
    // idempotent: a second run changes nothing
    Live.compactSinks(spark, outDir, keepBatches = 1)
    assert(rowsOfSink() == before)
    // retention: archive days below the cutoff age out; later data and
    // the un-folded live batches survive
    val days = new java.io.File(s"$outDir/deltas_archive").listFiles()
      .map(_.getName).filter(_.startsWith("day="))
      .map(_.stripPrefix("day=").toInt).sorted
    assert(days.length >= 2, s"want multiple archive days, saw ${days.toSeq}")
    val cutoff = days(1) // drop only the earliest day
    val droppedMap = Live.expireSinks(outDir, cutoff)
    assert(droppedMap("deltas") == 1)
    val after = rowsOfSink()
    assert(after.size < before.size)
    // exactly the first day's windows disappeared; everything else intact
    val keptExpected = before.filter { case (ws, _) =>
      (ws.getTime / 1000 / 86400) >= cutoff
    }
    assert(after == keptExpected)
  }

  test("live pipeline: sinks land and the daily summary upserts across batches") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_live").toString
    val tradesDir = s"$base/trades_in"
    val signalsDir = s"$base/signals_in"
    val outDir = s"$base/out"
    val ckptDir = s"$base/ckpt"
    def ts(sec: Long) = new Timestamp(sec * 1000L)

    // batch 1: trades for one bar; a signal that opens and TP-closes
    Seq(Trade("S", ts(1000), 10.0, 1.0, false),
        Trade("S", ts(1030), 12.0, 2.0, true),
        Trade("S", ts(2000), 11.0, 1.0, false)) // advances the watermark
      .toDS().coalesce(1).write.mode("append").parquet(tradesDir)
    Seq(FsmIn(1, 100.0, 100.0, 100.0, "LONG", 1.0, 1.0),
        FsmIn(2, 105.0, 105.0, 100.0, "NONE", 1.0, 1.0)) // TP exit, day 0
      .toDS().coalesce(1).write.mode("append").parquet(signalsDir)

    val qs = Seq(
      Live.barsQuery(spark, tradesDir, outDir, ckptDir),
      Live.deltaQuery(spark, tradesDir, outDir, ckptDir),
      Live.signalQuery(spark, tradesDir, outDir, ckptDir),
      Live.fusedQuery(spark, tradesDir, outDir, ckptDir),
      Live.lvQuery(spark, tradesDir, outDir, ckptDir),
      Live.tradesQuery(spark, signalsDir, outDir, ckptDir))
    qs.foreach(_.processAllAvailable())

    // batch 2: a second closed trade on a different day (bucket 30 -> day 1)
    Seq(FsmIn(30, 100.0, 100.0, 100.0, "SHORT", 1.0, 1.0),
        FsmIn(31, 95.0, 100.0, 95.0, "NONE", 1.0, 1.0)) // TP (short)
      .toDS().coalesce(1).write.mode("append").parquet(signalsDir)
    qs.foreach(_.processAllAvailable())
    qs.foreach(_.stop())

    val bars = Live.readSink(spark, outDir, "bars").get
    assert(bars.count() >= 1)
    val deltas = Live.readSink(spark, outDir, "deltas").get
    assert(deltas.count() >= 1)
    val signals = Live.readSink(spark, outDir, "signals").get
    assert(signals.count() == deltas.count()) // one z row per delta row
    // the fused decision stream landed per finalized bar, full frame
    val fused = Live.readSink(spark, outDir, "fused").get
    assert(fused.count() >= 1)
    assert(fused.columns.toSet.contains("total_long") &&
      fused.columns.toSet.contains("side"))
    // the chained-stateful LV query landed per-bar exact multi-TF rows
    val lv = Live.readSink(spark, outDir, "lv").get
    assert(lv.count() >= 1)
    assert(lv.columns.toSet.contains("lv_15m") &&
      lv.columns.toSet.contains("vol_factor"))
    assert(signals.select("signal").collect()
      .forall(_.getString(0) == "NONE")) // population below the minimum
    val trades = spark.read.parquet(s"$outDir/trades")
    assert(trades.filter($"action" === "EXIT").count() == 2)
    val summaryDf = spark.read.parquet(s"$outDir/daily_summary")
    // the live refresh emits the FULL batch Daily Summary schema (the
    // 12 columns fsm_daily_summary is hash-checked against), not a subset
    val batchSchema = graft.operators.Stateful
      .dailySummaryOf(trades.filter($"action" === "EXIT"))
      .schema.map(f => f.name -> f.dataType)
    assert(summaryDf.schema.map(f => f.name -> f.dataType) == batchSchema)
    val summary = summaryDf
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("n_trades"))
      .toMap
    assert(summary == Map(0L -> 1L, 1L -> 1L), s"summary was $summary")
    assert(summaryDf.filter($"day" === 0L).head.getAs[Double]("win_rate") == 1.0)

    // the order sink closed the loop: 2 ENTER + 2 EXIT, exits reduce-only
    val orders = spark.read.parquet(s"$outDir/orders")
    assert(orders.count() == 4)
    assert(orders.filter($"reduce_only").count() == 2)
    val byId = orders.collect()
      .map(r => r.getAs[String]("order_id") -> r.getAs[String]("order_side"))
      .toMap
    assert(byId("SYM-1-ENTER-LONG") == "BUY" && byId("SYM-2-EXIT-LONG") == "SELL")
    assert(byId("SYM-30-ENTER-SHORT") == "SELL" && byId("SYM-31-EXIT-SHORT") == "BUY")
    assert(orders.collect().forall(_.getAs[String]("status") == "PLACED"))

    // the incremental MERGE converges to exactly what a from-scratch
    // batch recompute over the full trades table would produce
    val exitsAll = trades.filter($"action" === "EXIT")
    val batchSummary = graft.operators.Stateful.dailySummaryOf(exitsAll)
      .collect().map(r => r.getAs[Long]("day") -> r).toMap
    summaryDf.collect().foreach { r =>
      val b = batchSummary(r.getAs[Long]("day"))
      Seq("n_trades", "wins", "losses").foreach(c =>
        assert(r.getAs[Long](c) == b.getAs[Long](c), c))
      Seq("win_rate", "total_pnl", "max_pnl", "min_pnl", "avg_hold")
        .foreach(c => assert(
          math.abs(r.getAs[Double](c) - b.getAs[Double](c)) < 1e-9, c))
    }
    val batchOrders = Live.ordersOf(
      trades.drop("batch_id"))
      .collect().map(r => r.getAs[String]("order_id") ->
        (r.getAs[String]("status"), r.getAs[String]("order_side"))).toMap
    val liveOrders = orders
      .collect().map(r => r.getAs[String]("order_id") ->
        (r.getAs[String]("status"), r.getAs[String]("order_side"))).toMap
    assert(liveOrders == batchOrders)

    // replay: a fresh checkpoint re-reads every signal file as batch 0 —
    // the batch-id guard must keep the trades table intact, and the
    // derived orders table must converge to the same rows
    val replay = Seq(
      Live.tradesQuery(spark, signalsDir, outDir, s"$base/ckpt_replay"))
    replay.foreach(_.processAllAvailable())
    replay.foreach(_.stop())
    assert(spark.read.parquet(s"$outDir/orders").count() == 4)
    assert(spark.read.parquet(s"$outDir/trades")
      .filter($"action" === "EXIT").count() == 2)
  }
}
