package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The generic batch-partitioned parquet sink every live table lands
  * through (trades AND the windowed tables — bars, deltas, signals,
  * fused, lv). One micro-batch = one partition directory with a
  * `_SUCCESS` marker; a maintenance compaction folds old partitions
  * into a day-keyed archive so a 20 Hz stream does not accrete
  * unbounded small files. Extracted from the trades commit protocol
  * (round 4) when the other five sinks — previously plain `writeStream`
  * parquet appends with no retention story — adopted it.
  *
  * Layout for a table at `liveDir`:
  *
  *   liveDir/batch_id=N/_SUCCESS     committed micro-batch partitions
  *   liveDir_archive/day=K/          compacted day partitions
  *   liveDir_archive/_compacted_batches   the folded-id watermark
  *
  * Invariants (each spec'd through the trades suite, which delegates
  * here):
  *
  *  - replay guard: a batch is committed iff its `_SUCCESS` exists (one
  *    stat, O(1)) or its id is at or below the folded watermark (one
  *    long — constant-size at any history length);
  *  - compaction folds FROM THE BOTTOM into day partitions via
  *    rename-aside swaps (backup, move in, drop backup), advances the
  *    watermark BEFORE deleting sources, and keeps at least the newest
  *    batch (the only one Structured Streaming can replay);
  *  - readers heal crashed swaps first, take ONLY committed partitions
  *    above the watermark on the live side (never root partition
  *    discovery), and dedup the live ∪ archive union on the table's
  *    row key — exactly-once through every crash window.
  *
  * At scale this is the bronze(recent)/archive split every streaming
  * lakehouse runs; a transactional table format would subsume it. */
object BatchSink {

  /** Thrown when a writer discovers it has been fenced by a newer
    * writer's lease — its output must stop advancing immediately. */
  final class ConcurrentWriterException(msg: String)
    extends RuntimeException(msg)

  /** A writer's fencing token for one live table: commits made through
    * [[commitFenced]] are refused once a newer lease exists. */
  final case class WriterLease(liveDir: String, epoch: Long)

  private def batchDir(liveDir: String, batchId: Long) =
    new java.io.File(s"$liveDir/batch_id=$batchId")

  private def archiveDir(liveDir: String) =
    new java.io.File(s"${liveDir}_archive")

  private def ledgerFile(liveDir: String) =
    new java.io.File(archiveDir(liveDir), "_compacted_batches")

  /** High watermark of folded batch ids: every committed batch id at or
    * below it has been folded into the day archive. Compaction always
    * folds from the bottom, so one long fully describes the folded set.
    * A legacy multi-line per-id ledger reads as its max — the same set. */
  def foldedWatermark(liveDir: String): Option[Long] = {
    val f = ledgerFile(liveDir)
    if (!f.exists()) None
    else new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      .split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      .flatMap(_.toLongOption).maxOption
  }

  /** O(1) idempotent-append guard (see the invariants above). */
  def alreadyCommitted(liveDir: String, batchId: Long): Boolean =
    new java.io.File(batchDir(liveDir, batchId), "_SUCCESS").exists() ||
      foldedWatermark(liveDir).exists(batchId <= _)

  /** Land one micro-batch in its own partition directory. `overwrite`
    * into the batch's OWN directory: a half-written partition from a
    * crash is replaced wholesale when the batch replays. */
  def commit(df: DataFrame, liveDir: String, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(batchDir(liveDir, batchId).toString)

  // ---- writer fencing (the single-writer contract, enforced) ----

  // legacy single-value epoch file (pre-CAS tables); read-only fallback
  private def epochFile(liveDir: String) =
    new java.io.File(liveDir, "_writer_epoch")

  private val EpochMarker = "_writer_epoch."

  /** The table's current writer epoch; 0 before any lease exists.
    * The epoch is the MAX over `_writer_epoch.<n>` marker files — each
    * marker was claimed with CREATE_NEW by exactly one acquirer, so the
    * max is a consistent read no matter how acquisitions interleave.
    * Tables written before the marker scheme fall back to the legacy
    * single-value `_writer_epoch` file. */
  def currentEpoch(liveDir: String): Long = {
    val markers = Option(new java.io.File(liveDir).listFiles())
      .getOrElse(Array.empty)
      .flatMap(f => if (f.getName.startsWith(EpochMarker))
        f.getName.stripPrefix(EpochMarker).toLongOption else None)
    if (markers.nonEmpty) markers.max
    else {
      val f = epochFile(liveDir)
      if (!f.exists()) 0L
      else new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        .trim.toLongOption.getOrElse(0L)
    }
  }

  /** Acquire the table's writer lease by bumping the epoch — the
    * fencing-token pattern: acquiring FENCES every earlier lease, whose
    * [[commitFenced]] calls then refuse with
    * [[ConcurrentWriterException]] instead of interleaving output. A
    * stream restart naturally acquires a fresh lease, fencing any
    * zombie of the previous run still holding the old one. This
    * DETECTS the second writer rather than serializing it (a
    * transactional table format's job); the contract stays one LIVE
    * writer, now enforced instead of assumed. */
  def acquireWriter(liveDir: String): WriterLease = {
    val dir = new java.io.File(liveDir)
    java.nio.file.Files.createDirectories(dir.toPath)
    // CAS acquisition: claim epoch e+1 by creating `_writer_epoch.<e+1>`
    // with CREATE_NEW — the filesystem serializes creators, so exactly
    // one acquirer wins a given epoch; a loser observes the collision
    // and retries on top of the winner (the old read-increment-rename
    // admitted two writers that both read e and both published e+1).
    var lease: WriterLease = null
    while (lease == null) {
      val next = currentEpoch(liveDir) + 1
      try {
        java.nio.file.Files.createFile(
          new java.io.File(dir, s"$EpochMarker$next").toPath)
        lease = WriterLease(liveDir, next)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => // lost; retry
      }
    }
    // bounded housekeeping: markers more than 2 epochs behind are dead
    // (deleted only AFTER the new one exists, so a concurrent
    // currentEpoch scan always sees at least the current marker)
    Option(dir.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.getName.startsWith(EpochMarker) &&
        f.getName.stripPrefix(EpochMarker).toLongOption
          .exists(_ < lease.epoch - 2)) { f.delete(); () }
    }
    lease
  }

  /** Throw iff a newer lease has fenced this one. */
  def checkLease(lease: WriterLease): Unit = {
    val cur = currentEpoch(lease.liveDir)
    if (cur != lease.epoch)
      throw new ConcurrentWriterException(
        s"writer epoch ${lease.epoch} fenced by $cur at ${lease.liveDir} — " +
          "a newer writer holds this table; this writer must stop")
  }

  /** [[commit]] under a lease: refuse BEFORE touching the table when
    * fenced (the stale writer never overwrites a partition the new
    * writer may own), and re-check AFTER the write — if fencing raced
    * the write, the batch directory is harmless (overwrite-into-own-dir
    * keeps replays idempotent, and the new writer replays the id from
    * its own checkpoint) but this writer must stop advancing, so the
    * post-check still throws. No committed batch is lost (the new
    * writer's commits are untouched) and none is double-applied (ids
    * key directories; the replay guard is id-based). */
  def commitFenced(df: DataFrame, lease: WriterLease, batchId: Long): Unit = {
    checkLease(lease)
    commit(df, lease.liveDir, batchId)
    checkLease(lease)
  }

  /** Restore rename-aside-swapped partition directories whose swap
    * crashed between its two renames (partition missing, the dot-backup
    * holds the only copy) and drop backups whose partition landed. MUST
    * run before any read of a swapped table. Race-tolerant for the
    * reader side: two concurrent readers healing the same backup both
    * converge (the loser's failed rename is fine once the partition
    * exists); ONE compactor at a time remains the operational contract,
    * as with any non-transactional table maintenance. */
  def healBackups(dir: java.io.File, prefix: String): Unit =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(s".$prefix") &&
        f.getName.endsWith("_old"))
      .foreach { old =>
        val dst = new java.io.File(dir,
          old.getName.stripPrefix(".").stripSuffix("_old"))
        if (dst.exists()) graft.functions.Fs.deleteRecursively(old)
        else if (!old.renameTo(dst) && !dst.exists() && old.exists())
          // a failed rename is only a failure while the partition is
          // still missing AND the backup still holds the data — a
          // concurrent reader winning the same heal satisfies both
          throw new java.io.IOException(
            s"partition heal failed: $old -> $dst")
      }

  /** The table for consumers: committed live partitions above the
    * watermark ∪ the day archive, deduped on `key`. None while empty. */
  def read(spark: SparkSession, liveDir: String,
      key: Seq[String]): Option[DataFrame] = {
    healBackups(archiveDir(liveDir), "day=")
    val wm = foldedWatermark(liveDir).getOrElse(Long.MinValue)
    val liveDirs = Option(new java.io.File(liveDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id=") &&
        new java.io.File(f, "_SUCCESS").exists() &&
        // defensive parse (like expire's day names): a stray non-numeric
        // "batch_id=..." artifact must not take every read down
        f.getName.stripPrefix("batch_id=").toLongOption.exists(_ > wm))
    val live =
      if (liveDirs.isEmpty) None
      else Some(spark.read.parquet(liveDirs.map(_.toString).toIndexedSeq: _*))
    val arch = archiveDir(liveDir)
    val archived =
      if (arch.exists() &&
        Option(arch.listFiles()).exists(_.exists(f =>
          f.isDirectory && f.getName.startsWith("day="))))
        // batch_id is snapshot provenance ([[readAsOf]]), not consumer
        // schema — dropped here (no-op on pre-provenance archives)
        Some(spark.read.parquet(arch.toString).drop("day", "batch_id"))
      else None
    (live, archived) match {
      case (Some(l), Some(a)) =>
        Some(l.unionByName(a).dropDuplicates(key))
      case (l, a) => l.orElse(a)
    }
  }

  /** Snapshot read — the table AS OF a batch id: exactly the rows
    * landed by committed batches with id <= `asOfBatch`. The batch id
    * is this layout's snapshot handle (the snapshot-id analog of a
    * transactional table format): compaction preserves per-row batch
    * ids into the day archive (partition-column inference via
    * `basePath`, stored as a plain column), so time travel SURVIVES
    * folding — reading "as of batch 3" returns the same rows before
    * and after batches 0..4 collapse into day partitions. Retention
    * ([[expire]]) bounds how far back a snapshot reaches, exactly like
    * snapshot expiry. Archive rows written before provenance tracking
    * (null batch_id) predate every snapshot and are included. The
    * result keeps the `batch_id` column — as-of readers usually want
    * the provenance. */
  def readAsOf(spark: SparkSession, liveDir: String, key: Seq[String],
      asOfBatch: Long): Option[DataFrame] = {
    healBackups(archiveDir(liveDir), "day=")
    val liveDirs = Option(new java.io.File(liveDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id=") &&
        new java.io.File(f, "_SUCCESS").exists() &&
        f.getName.stripPrefix("batch_id=").toLongOption.exists(_ <= asOfBatch))
    val live =
      if (liveDirs.isEmpty) None
      else Some(spark.read.option("basePath", liveDir)
        .parquet(liveDirs.map(_.toString).toIndexedSeq: _*)
        .withColumn("batch_id", col("batch_id").cast("long")))
    val arch = archiveDir(liveDir)
    val archived =
      if (arch.exists() &&
        Option(arch.listFiles()).exists(_.exists(f =>
          f.isDirectory && f.getName.startsWith("day="))))
        Some {
          val a = spark.read.parquet(arch.toString).drop("day")
          if (a.columns.contains("batch_id"))
            a.filter(col("batch_id").isNull || col("batch_id") <= asOfBatch)
          else a
        }
      else None
    (live, archived) match {
      case (Some(l), Some(a)) =>
        Some(l.unionByName(a, allowMissingColumns = true)
          .dropDuplicates(key))
      case (l, a) => l.orElse(a)
    }
  }

  /** Retention: drop archive day partitions with day < `minDay` — the
    * TTL pass that bounds TOTAL storage, where [[compact]] only bounds
    * the partition-directory count. Deliberately destructive (that is
    * what retention means); heals crashed swaps first so a backed-up
    * day is restored before the cutoff judges it, and never touches
    * live batch partitions (their ids say nothing about event time —
    * they fold into days first, then age out). Returns the dropped day
    * count. */
  def expire(liveDir: String, minDay: Int): Int = {
    val arch = archiveDir(liveDir)
    healBackups(arch, "day=")
    val dropped = Option(arch.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("day=") &&
        f.getName.stripPrefix("day=").toIntOption.exists(_ < minDay))
    dropped.foreach(graft.functions.Fs.deleteRecursively)
    dropped.length
  }

  /** Fold committed batch partitions older than the newest `keepBatches`
    * (clamped to >= 1 — the newest batch is the one Structured Streaming
    * can replay, and its replay guard needs the `_SUCCESS` marker to
    * survive un-folded) into day partitions keyed by `bucketExpr` (a
    * SQL expression over the table's columns yielding an int day).
    * `noFoldAtOrAbove` lets callers pin batches whose side effects are
    * still pending (the trades pending-refresh marker). Crash-safe and
    * idempotent; see the object doc for the step order. */
  def compact(spark: SparkSession, liveDir: String, bucketExpr: String,
      key: Seq[String], keepBatches: Int,
      noFoldAtOrAbove: Long = Long.MaxValue): Unit = {
    import org.apache.spark.sql.functions.{col, expr}
    val arch = archiveDir(liveDir)
    // heal FIRST, before any early return: a crash between a prior
    // swap's two renames must be repaired even when this run has
    // nothing new to fold
    healBackups(arch, "day=")
    val keep = math.max(1, keepBatches)
    val batchDirs = Option(new java.io.File(liveDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id=") &&
        new java.io.File(f, "_SUCCESS").exists())
      .flatMap(f =>
        f.getName.stripPrefix("batch_id=").toLongOption.map(_ -> f))
      .sortBy(_._1)
    if (batchDirs.isEmpty) return
    val cutoff = math.min(batchDirs.last._1 - keep, noFoldAtOrAbove - 1)
    val toFold = batchDirs.filter(_._1 <= cutoff)
    if (toFold.isEmpty) return
    // basePath keeps the batch_id partition column: folded rows carry
    // their landing batch into the archive as snapshot provenance, so
    // [[readAsOf]] still answers "as of batch N" after the fold
    val batchRows = spark.read.option("basePath", liveDir)
      .parquet(toFold.map(_._2.toString).toIndexedSeq: _*)
      // pin the inferred partition type: small ids infer int, larger
      // infer long — an archive must not mix the two across folds
      .withColumn("batch_id", col("batch_id").cast("long"))
      .withColumn("day", expr(bucketExpr))
    // touched days: tiny driver-side list (bounded by the fold's time
    // span), used as partition-pruning literals — not a data fetch
    val days = batchRows.select(col("day")).distinct()
      .collect().map(_.getInt(0))
    val priorArchive =
      if (arch.exists() &&
        Option(arch.listFiles()).exists(_.exists(f =>
          f.isDirectory && f.getName.startsWith("day="))))
        spark.read.parquet(arch.toString)
          .filter(col("day").isin(days.map(Int.box): _*))
      else batchRows.limit(0)
    // allowMissingColumns: a pre-provenance archive (no batch_id
    // column) unions with null ids — "predates every snapshot"
    val merged = priorArchive.unionByName(batchRows,
        allowMissingColumns = true)
      .dropDuplicates(key)
    val live = new java.io.File(liveDir)
    val tmp = new java.io.File(live.getParentFile,
      s".${live.getName}_archive_tmp")
    merged.write.mode("overwrite").partitionBy("day").parquet(tmp.toString)
    java.nio.file.Files.createDirectories(arch.toPath)
    days.foreach { d =>
      val src = new java.io.File(tmp, s"day=$d")
      val dst = new java.io.File(arch, s"day=$d")
      val old = new java.io.File(arch, s".day=${d}_old")
      if (src.exists()) {
        // up to one retry: a concurrent reader's heal can restore the
        // backup between our two renames (it sees dst missing and puts
        // the old data back) — re-doing the backup rename converges;
        // both directory states it can race into hold complete data
        var attempts = 0
        var done = false
        while (!done && attempts < 2) {
          attempts += 1
          if (old.exists()) graft.functions.Fs.deleteRecursively(old)
          if (dst.exists() && !dst.renameTo(old))
            throw new java.io.IOException(
              s"archive swap failed: $dst -> $old")
          done = src.renameTo(dst)
          if (!done && !dst.exists()) {
            old.renameTo(dst) // restore; heal on next run
            throw new java.io.IOException(
              s"archive swap failed: $src -> $dst")
          }
        }
        if (!done)
          throw new java.io.IOException(
            s"archive swap failed after retry: $src -> $dst")
        if (old.exists()) graft.functions.Fs.deleteRecursively(old)
      }
    }
    graft.functions.Fs.deleteRecursively(tmp)
    // watermark BEFORE deleting sources: a compacted batch must never
    // look uncommitted to the replay guard, even mid-crash. One long,
    // written via write-aside + atomic rename — never grows.
    val wm = math.max(
      foldedWatermark(liveDir).getOrElse(Long.MinValue), toFold.last._1)
    val ltmp = new java.io.File(arch, "._ledger_tmp")
    java.nio.file.Files.write(ltmp.toPath, wm.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(ltmp.toPath, ledgerFile(liveDir).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    toFold.foreach { case (_, dir) =>
      graft.functions.Fs.deleteRecursively(dir)
    }
  }
}
