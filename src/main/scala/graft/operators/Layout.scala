package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.OpModule

/** Data-layout and skew-diagnostic operators — the table-LAYOUT half of
  * the 100 TB story. Everything else in this engine assumes the scan
  * layer can skip data it does not need; this family builds the skipping
  * index and proves it skips.
  *
  *  - `layout_zorder`: Z-order (Morton) clustering of the event stream on
  *    (time, entity) with per-granule min/max statistics — the skipping
  *    index a lakehouse table format keeps per file. The Z-value
  *    interleaves 4+4 bits of the two dimensions' range-buckets, so rows
  *    close in BOTH dimensions land in the same granule and every
  *    granule's bounding box is tight in both.
  *  - `layout_prune`: the payoff measurement. For a 2-D box predicate
  *    (middle quarter of each dimension, ~1/16 of rows) it counts the
  *    granules whose [min,max] boxes intersect the box under (a) the
  *    Z-order layout and (b) a plain time-sorted layout. Time-sort can
  *    only skip on time (~1/4 of granules survive); Z-order skips on both
  *    (~1/16 + boundary) — LayoutSpec asserts the strict win and that
  *    skipped granules contain no qualifying row (pruning is sound).
  *  - `diag_partition_stats`: rows/keys per hash partition for the
  *    engine's partitioning of `user_id` into 32 buckets — the balance
  *    audit run before committing a partitioning key at scale.
  *  - `diag_heavy_hitters`: exact per-key census with a salt-candidate
  *    flag (share > [[HotFactor]]× the 1/[[Partitions]] fair share) — the
  *    diagnostic that decides when `agg_salted`'s two-phase plan is
  *    needed. The fixture plants a deterministic 50%-hot key (the driver
  *    data is uniform by construction), same trick as the phash family's
  *    planted near-duplicates.
  *
  * Scale shape: granule ranks are TWO-LEVEL (rank within a bounded
  * Z-cell / time-bucket partition + broadcast exclusive prefix sum of
  * per-cell counts), the same machinery as `pipeline_shuffle` — no
  * single-partition window anywhere on the engine side; the oracle keeps
  * the simple global-window form. The min/max scalar frame is a 1-row
  * broadcast. A production write would range-partition by Z-value and
  * write one file per granule; the granule-stats frame here IS that
  * write's footer metadata.
  */
object Layout extends OpModule {

  /** Bits per dimension in the Z-value (4+4 → 256 cells). */
  val ZBits = 4

  /** Rows per layout granule (the stand-in for one file's row count). */
  val GranuleRows = 64L

  /** Hash-partition count diagnosed by `diag_partition_stats`. */
  val Partitions = 32

  /** A key is a salt candidate above HotFactor× its fair share. */
  val HotFactor = 4

  private val ZSide = 1 << ZBits // 16 buckets per dimension

  /** Range bucket in [0, 16): ((v - lo) * 16) intdiv (hi - lo + 1).
    * Pure integer arithmetic — identical in both engines; `d` is the
    * integer-division operator (`div` Spark, `//` DuckDB). */
  private def bucketExpr(v: String, lo: String, hi: String, d: String) =
    s"((($v) - ($lo)) * $ZSide) $d (($hi) - ($lo) + 1)"

  /** Morton interleave of two [0,16) buckets: x takes even bit lanes,
    * y odd. Same generated formula on both sides. */
  private def zExpr(xb: String, yb: String, d: String): String =
    (0 until ZBits).map { i =>
      s"((($xb) $d ${1 << i}) % 2) * ${1L << (2 * i)}" +
        s" + ((($yb) $d ${1 << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** Events with range-stats, both dimensions' buckets and the Z-value
    * attached; shared by both layout queries (memoized). The min/max
    * frame is one row, broadcast — the only pre-pass a real layout job
    * needs before its range-partitioned write. */
  private[graft] def zvalDf(spark: SparkSession, dir: String): DataFrame =
    graft.functions.DfMemo.cached(spark, s"layout_zval:$dir") {
      import spark.implicits._
      val stats = Tables.events(spark, dir).agg(
        min($"ts_us").as("tlo"), max($"ts_us").as("thi"),
        min($"user_id").as("ulo"), max($"user_id").as("uhi"))
      Tables.events(spark, dir)
        .select($"event_id", $"ts_us", $"user_id")
        .crossJoin(broadcast(stats))
        .withColumn("xb", expr(bucketExpr("ts_us", "tlo", "thi", "div")))
        .withColumn("yb", expr(bucketExpr("user_id", "ulo", "uhi", "div")))
        .withColumn("zval", expr(zExpr("xb", "yb", "div")))
    }

  /** Two-level global rank → fixed-width granule id. `cell` must be
    * BOUNDED (≤ a few hundred distinct values) and MONOTONE in the order
    * prefix, so per-cell rank + the cell's exclusive prefix-sum base
    * equals the single-window global rank exactly (the
    * `pipeline_shuffle` argument; asserted in LayoutSpec). */
  private[graft] def granuleByRank(df: DataFrame, cell: Column, tie: Column*): DataFrame = {
    val withCell = df.withColumn("cell", cell)
    val wIn = Window.partitionBy(col("cell")).orderBy(tie: _*)
    val wBase = Window.orderBy(col("cell"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = withCell.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"))
      .withColumn("base", coalesce(sum(col("n")).over(wBase), lit(0L)))
      .select(col("cell"), col("base"))
    withCell
      .withColumn("rw", (row_number().over(wIn) - 1).cast("long"))
      .join(broadcast(bases), Seq("cell"))
      .withColumn("granule", expr(s"(base + rw) div $GranuleRows"))
      .drop("cell", "rw", "base")
  }

  private def granuleStats(df: DataFrame): DataFrame =
    df.groupBy(col("granule")).agg(
      count(lit(1)).as("n_rows"),
      min(col("ts_us")).as("ts_lo"), max(col("ts_us")).as("ts_hi"),
      min(col("user_id")).as("uid_lo"), max(col("user_id")).as("uid_hi"))

  /** Z-order granule stats — the skipping index itself. */
  private def zorderDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    granuleStats(granuleByRank(zvalDf(spark, dir), $"zval", $"event_id"))
      .select(col("granule"), col("n_rows"), col("ts_lo"), col("ts_hi"),
        col("uid_lo"), col("uid_hi"))
  }

  // Oracle keeps the single-window form (row_number over the full order);
  // LayoutSpec proves the two-level engine rank matches it bit-for-bit.
  private def zvalSqlBody: String =
    s"""st AS (SELECT min(epoch_us(ts)) AS tlo, max(epoch_us(ts)) AS thi,
       |             min(user_id) AS ulo, max(user_id) AS uhi FROM events),
       |zb AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id,
       |         ${bucketExpr("epoch_us(ts)", "tlo", "thi", "//")} AS xb,
       |         ${bucketExpr("user_id", "ulo", "uhi", "//")} AS yb
       |       FROM events, st),
       |z AS (SELECT *, ${zExpr("xb", "yb", "//")} AS zval FROM zb)""".stripMargin

  private val zorderSql: String =
    s"""WITH $zvalSqlBody,
       |g AS (SELECT *, (row_number() OVER (ORDER BY zval, event_id) - 1)
       |                // $GranuleRows AS granule FROM z)
       |SELECT granule, count(*) AS n_rows,
       |  min(ts_us) AS ts_lo, max(ts_us) AS ts_hi,
       |  min(user_id) AS uid_lo, max(user_id) AS uid_hi
       |FROM g GROUP BY 1""".stripMargin

  /** The box predicate both sides prune against: the middle quarter of
    * each dimension, half-open — selects ~1/16 of the rows. */
  private def boxSql(d: String): (String, String, String, String) = (
    s"tlo + ((thi - tlo + 1) $d 4)", s"tlo + ((thi - tlo + 1) $d 2)",
    s"ulo + ((uhi - ulo + 1) $d 4)", s"ulo + ((uhi - ulo + 1) $d 2)")

  /** Granule-pruning comparison: Z-order vs time-sorted layout against
    * the same 2-D box predicate. `rows_selected` is layout-independent
    * (same rows either way) and is carried on both rows so each row is a
    * self-contained audit line. */
  /** Per-granule scan verdict against the standard middle-quarter box:
    * the stats frame (which must carry the crossJoined tlo..uhi scalar
    * bounds) gains a `scan` flag — false iff the granule's bounding box
    * provably misses the predicate. Shared by the `layout_prune` audit
    * and the executed-compaction lifecycle spec. */
  private[graft] def boxScanDf(g: DataFrame): DataFrame = {
    val (qtl, qth, qul, quh) = boxSql("div")
    g.withColumn("scan",
      !(col("ts_hi") < expr(qtl) || col("ts_lo") >= expr(qth) ||
        col("uid_hi") < expr(qul) || col("uid_lo") >= expr(quh)))
  }

  /** The standard box predicate over ROWS (same bounds as [[boxScanDf]]);
    * rows must carry tlo..uhi. */
  private[graft] def boxRowPred: Column = {
    val (qtl, qth, qul, quh) = boxSql("div")
    col("ts_us") >= expr(qtl) && col("ts_us") < expr(qth) &&
      col("user_id") >= expr(qul) && col("user_id") < expr(quh)
  }

  /** Granule-stats of a ranked row frame — metadata out of data; shared
    * by the layout queries and the lifecycle spec. */
  private[graft] def granuleStatsOf(df: DataFrame): DataFrame =
    granuleStats(df)

  private def pruneDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = zvalDf(spark, dir)
    val (qtl, qth, qul, quh) = boxSql("div")
    def audit(layout: String, g: DataFrame): DataFrame = {
      val withBox = boxScanDf(g)
      withBox.agg(
        count(lit(1)).as("granules_total"),
        sum(when(col("scan"), 1L).otherwise(0L)).as("granules_scanned"))
        .withColumn("layout", lit(layout))
    }
    val sel = base
      .filter($"ts_us" >= expr(qtl) && $"ts_us" < expr(qth) &&
        $"user_id" >= expr(qul) && $"user_id" < expr(quh))
      .agg(count(lit(1)).as("rows_selected"))
    // stats carry (tlo..uhi) per granule via min/max? No — re-attach the
    // 1-row scalar frame so the box bounds are in scope for the audit.
    val stats = base.select($"tlo", $"thi", $"ulo", $"uhi").limit(1)
    val zg = granuleStats(granuleByRank(base, $"zval", $"event_id"))
      .crossJoin(broadcast(stats))
    val tcell = expr(s"((ts_us - tlo) * 256) div (thi - tlo + 1)")
    val lg = granuleStats(granuleByRank(base, tcell, $"ts_us", $"event_id"))
      .crossJoin(broadcast(stats))
    audit("zorder", zg).unionByName(audit("time_sorted", lg))
      .crossJoin(broadcast(sel))
      .select($"layout", $"granules_total", $"granules_scanned",
        $"rows_selected")
  }

  private val pruneSql: String = {
    val (qtl, qth, qul, quh) = boxSql("//")
    s"""WITH $zvalSqlBody,
       |gz AS (SELECT *, (row_number() OVER (ORDER BY zval, event_id) - 1)
       |                 // $GranuleRows AS granule FROM z),
       |gl AS (SELECT *, (row_number() OVER (ORDER BY ts_us, event_id) - 1)
       |                 // $GranuleRows AS granule FROM z),
       |sz AS (SELECT granule, min(ts_us) AS ts_lo, max(ts_us) AS ts_hi,
       |              min(user_id) AS uid_lo, max(user_id) AS uid_hi
       |       FROM gz GROUP BY 1),
       |sl AS (SELECT granule, min(ts_us) AS ts_lo, max(ts_us) AS ts_hi,
       |              min(user_id) AS uid_lo, max(user_id) AS uid_hi
       |       FROM gl GROUP BY 1),
       |sel AS (SELECT count(*) AS rows_selected FROM z, st
       |        WHERE ts_us >= $qtl AND ts_us < $qth
       |          AND user_id >= $qul AND user_id < $quh),
       |az AS (SELECT 'zorder' AS layout, count(*) AS granules_total,
       |         sum(CASE WHEN NOT (ts_hi < $qtl OR ts_lo >= $qth OR
       |                            uid_hi < $qul OR uid_lo >= $quh)
       |             THEN 1 ELSE 0 END)::BIGINT AS granules_scanned
       |       FROM sz, st),
       |al AS (SELECT 'time_sorted' AS layout, count(*) AS granules_total,
       |         sum(CASE WHEN NOT (ts_hi < $qtl OR ts_lo >= $qth OR
       |                            uid_hi < $qul OR uid_lo >= $quh)
       |             THEN 1 ELSE 0 END)::BIGINT AS granules_scanned
       |       FROM sl, st)
       |SELECT layout, granules_total, granules_scanned, rows_selected
       |FROM (SELECT * FROM az UNION ALL SELECT * FROM al), sel""".stripMargin
  }

  /** Compaction target: small granules merge until ~4 source granules
    * per output file (the OPTIMIZE step of a lakehouse table). */
  val CompactTargetRows = 4 * GranuleRows

  /** Compaction plan — the third step of the layout lifecycle (write →
    * prune → compact). Greedy cut of the zval-ordered granule stream at
    * every [[CompactTargetRows]] cumulative rows: adjacent-in-Z granules
    * merge, so output files keep tight bounding boxes and the skipping
    * index survives compaction. THE PLAN RUNS ON METADATA ONLY — the
    * input is the granule-stats frame (157 rows at sf0.01), never the
    * data, exactly like a real table service deciding which files to
    * rewrite; the single ordered window is over that metadata frame.
    * `compact_group` is the output-file id; `is_underfull` marks inputs
    * below the target that exist only to be merged. */
  private def compactionDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"granule")
      .rowsBetween(Window.unboundedPreceding, -1)
    zorderDf(spark, dir)
      .withColumn("cum_before", coalesce(sum($"n_rows").over(w), lit(0L)))
      .withColumn("compact_group", expr(s"cum_before div $CompactTargetRows"))
      .withColumn("is_underfull", $"n_rows" < CompactTargetRows)
      .select($"granule", $"n_rows", $"compact_group", $"is_underfull")
  }

  private val compactionSql: String =
    s"""WITH g AS ($zorderSql),
       |c AS (SELECT granule, n_rows,
       |        coalesce(sum(n_rows) OVER (ORDER BY granule
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          AS cum_before
       |      FROM g)
       |SELECT granule, n_rows,
       |  (cum_before // $CompactTargetRows)::BIGINT AS compact_group,
       |  n_rows < $CompactTargetRows AS is_underfull
       |FROM c""".stripMargin

  // ---- per-granule Bloom skipping index ----

  /** Bloom bits per granule / hash count / probe residue. m=1024 over
    * ≤64 distinct keys × k=3 gives ~0.7% false-positive rate per
    * granule. */
  val LbM = 1024L
  val LbK = 3
  val LbProbeMod = 31L
  private val LbP = 2147483647L // 2^31-1, prime > any user_id
  private val LbA: Seq[Long] = (0 until LbK).map(j =>
    1L + graft.functions.ColFns.md5Const32(s"lbla$j") % (LbP - 1))
  private val LbB: Seq[Long] = (0 until LbK).map(j =>
    graft.functions.ColFns.md5Const32(s"lblb$j") % LbP)
  private def lbPos(j: Int, u: Column): Column =
    graft.functions.ColFns.universalBucket(LbA(j), LbB(j), LbP, LbM, u)
  private def lbPosSql(j: Int, u: String): String =
    graft.functions.ColFns.universalBucketSql(LbA(j), LbB(j), LbP, LbM, u)

  /** Per-granule BLOOM skipping index priced against min/max
    * (`layout_bloom_prune`): a point predicate `user_id = X` is the
    * lookup min/max zone maps handle WORST — any granule whose uid
    * range STRADDLES X scans even when X never occurs in it — and
    * exactly what a per-granule Bloom filter (Parquet bloom /
    * Delta-style) exists for. Per granule, k=[[LbK]] universal-hash
    * positions of each distinct member key set bits in an
    * [[LbM]]-wide table (the bits frame is granule-count × set-bits
    * METADATA, broadcastable like the stats frame); a probe scans a
    * granule only when all k of its positions are set AND the min/max
    * box admits it (a real reader consults both indexes). For every
    * [[LbProbeMod]]-residue probe key the audit row carries the
    * zone-map scan count, the bloom∧zone count, the true occurrence
    * count, and `n_missed` — true granules the index skipped — which
    * the Bloom no-false-negative guarantee pins to 0 (hash-checked,
    * and LayoutSpec asserts it with the FP win). All arithmetic is
    * integer/universal hashing, so the oracle replays bit-for-bit. */
  private def bloomPruneDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ranked = granuleByRank(zvalDf(spark, dir), $"zval", $"event_id")
    val member = ranked.select($"granule", $"user_id").distinct()
    val stats = granuleStats(ranked)
    val bits = member.select($"granule",
      explode(array((0 until LbK).map(j => lbPos(j, $"user_id")): _*))
        .as("pos")).distinct()
    val probes = member.select($"user_id").distinct()
      .filter($"user_id" % LbProbeMod === 0)
    val probePos = probes.select($"user_id",
      explode(array((0 until LbK).map(j =>
        struct(lit(j).as("j"), lbPos(j, $"user_id").as("pos"))): _*))
        .as("jp"))
      .select($"user_id", $"jp.j", $"jp.pos")
    val bloomHit = probePos.join(bits, Seq("pos"))
      .groupBy($"user_id", $"granule")
      .agg(countDistinct($"j").as("kj")).filter($"kj" === LbK)
      .select($"user_id", $"granule")
    val mmHit = broadcast(probes).crossJoin(stats)
      .filter($"user_id" >= $"uid_lo" && $"user_id" <= $"uid_hi")
      .select($"user_id", $"granule")
    val scanned = bloomHit.intersect(mmHit)
    val tru = member.join(broadcast(probes), Seq("user_id"))
      .select($"user_id", $"granule")
    val total = stats.agg(count(lit(1)).as("granules_total"))
    def cnt(df: DataFrame, as: String) =
      df.groupBy($"user_id").agg(count(lit(1)).as(as))
    probes.crossJoin(broadcast(total))
      .join(cnt(mmHit, "scanned_minmax"), Seq("user_id"), "left")
      .join(cnt(scanned, "scanned_bloom"), Seq("user_id"), "left")
      .join(cnt(tru, "n_true"), Seq("user_id"), "left")
      .join(cnt(tru.join(scanned, Seq("user_id", "granule"), "left_anti"),
        "n_missed"), Seq("user_id"), "left")
      .select($"user_id", $"granules_total",
        coalesce($"scanned_minmax", lit(0L)).as("scanned_minmax"),
        coalesce($"scanned_bloom", lit(0L)).as("scanned_bloom"),
        coalesce($"n_true", lit(0L)).as("n_true"),
        coalesce($"n_missed", lit(0L)).as("n_missed"))
  }

  private val bloomPruneSql: String = {
    val bitRows = (0 until LbK).map(j =>
      s"SELECT granule, ${lbPosSql(j, "user_id")} AS pos FROM member")
      .mkString("\nUNION ALL\n")
    val probeRows = (0 until LbK).map(j =>
      s"SELECT user_id, $j AS j, ${lbPosSql(j, "user_id")} AS pos FROM probes")
      .mkString("\nUNION ALL\n")
    s"""WITH $zvalSqlBody,
       |g AS (SELECT *, (row_number() OVER (ORDER BY zval, event_id) - 1)
       |                // $GranuleRows AS granule FROM z),
       |member AS (SELECT DISTINCT granule, user_id FROM g),
       |stats AS (SELECT granule, min(user_id) AS uid_lo,
       |            max(user_id) AS uid_hi FROM g GROUP BY 1),
       |bits AS (SELECT DISTINCT granule, pos FROM ($bitRows)),
       |probes AS (SELECT DISTINCT user_id FROM member
       |           WHERE user_id % $LbProbeMod = 0),
       |pp AS ($probeRows),
       |bh AS (SELECT pp.user_id, b.granule FROM pp
       |       JOIN bits b USING (pos)
       |       GROUP BY 1, 2 HAVING count(DISTINCT pp.j) = $LbK),
       |mm AS (SELECT p.user_id, s.granule FROM probes p, stats s
       |       WHERE p.user_id BETWEEN s.uid_lo AND s.uid_hi),
       |sc AS (SELECT user_id, granule FROM bh
       |       INTERSECT SELECT user_id, granule FROM mm),
       |tru AS (SELECT m.user_id, m.granule FROM member m
       |        JOIN probes USING (user_id)),
       |tot AS (SELECT count(*) AS granules_total FROM stats)
       |SELECT p.user_id, tot.granules_total,
       |  (SELECT count(*) FROM mm WHERE mm.user_id = p.user_id)
       |    AS scanned_minmax,
       |  (SELECT count(*) FROM sc WHERE sc.user_id = p.user_id)
       |    AS scanned_bloom,
       |  (SELECT count(*) FROM tru WHERE tru.user_id = p.user_id)
       |    AS n_true,
       |  (SELECT count(*) FROM tru t WHERE t.user_id = p.user_id
       |     AND NOT EXISTS (SELECT 1 FROM sc
       |       WHERE sc.user_id = t.user_id AND sc.granule = t.granule))
       |    AS n_missed
       |FROM probes p, tot""".stripMargin
  }

  /** Delta share for the incremental-append audit: every
    * [[DeltaMod]]-th event plays the "new batch" (the
    * `dedup_incremental` convention). */
  val DeltaMod = 5L

  /** Clamped bucket expressions over LITERAL base stats — the routing
    * transform a streaming append monitor ships to executors (the
    * standing index's min/max are frozen numbers by the time deltas
    * arrive). Same formula as the batch delta path. */
  private[graft] def clampedBucketExprs(tlo: Long, thi: Long,
      ulo: Long, uhi: Long): (String, String) = {
    val bx = bucketExpr("ts_us", tlo.toString, thi.toString, "div")
    val by = bucketExpr("user_id", ulo.toString, uhi.toString, "div")
    (s"least(${ZSide - 1}, greatest(0, $bx))",
      s"least(${ZSide - 1}, greatest(0, $by))")
  }

  /** Z-value from already-computed `xb`/`yb` columns. */
  private[graft] def zFromBuckets: String = zExpr("xb", "yb", "div")

  /** The standing index a delta batch routes against: per-granule
    * (zlo, zhi, box) built from the BASE rows — the frame a layout
    * monitor broadcasts. */
  private[graft] def standingGstats(spark: SparkSession, dir: String): DataFrame =
    // memoized: layout_incremental references this granule-count-sized
    // frame four times (last-granule lookup, routing broadcast, widening
    // audit, final report spine) — un-checkpointed, each reference
    // re-ran the base scan + box stats + Z-transform + granule rank
    graft.functions.DfMemo.cached(spark, s"layout_gstats:$dir") {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select($"event_id", $"ts_us", $"user_id")
      val base = ev.filter($"event_id" % DeltaMod =!= 0)
      val stats = base.agg(
        min($"ts_us").as("tlo"), max($"ts_us").as("thi"),
        min($"user_id").as("ulo"), max($"user_id").as("uhi"))
      val z = base.crossJoin(broadcast(stats))
        .withColumn("xb", expr(bucketExpr("ts_us", "tlo", "thi", "div")))
        .withColumn("yb", expr(bucketExpr("user_id", "ulo", "uhi", "div")))
        .withColumn("zval", expr(zExpr("xb", "yb", "div")))
      granuleByRank(z, $"zval", $"event_id")
        .groupBy($"granule").agg(
          count(lit(1)).as("n_base"),
          min($"zval").as("zlo"), max($"zval").as("zhi"),
          min($"ts_us").as("ts_lo"), max($"ts_us").as("ts_hi"),
          min($"user_id").as("uid_lo"), max($"user_id").as("uid_hi"))
    }

  /** Incremental append (`layout_incremental`) — the fourth layout
    * lifecycle step: route a delta batch into the STANDING Z-order
    * layout and report, per granule, how many rows land there and
    * whether its bounding box must widen (stale-box granules prune
    * worse until the next OPTIMIZE — exactly the stats-drift a
    * lakehouse append causes). The standing index is built from the
    * BASE rows only; delta rows are bucketed with the BASE min/max
    * transform (clamped to [0,15] — new data outside the old value
    * range must still route somewhere) and routed to the first granule
    * whose Z-range still covers their Z-value (ties at granule
    * boundaries break low; values past the last granule append to it).
    * The routing join is delta × a BROADCAST granule-bounds frame (157
    * rows) — metadata-sized, like every other index decision here. */
  private def incrementalDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"ts_us", $"user_id")
    val base = ev.filter($"event_id" % DeltaMod =!= 0)
    val delta = ev.filter($"event_id" % DeltaMod === 0)
    val stats = base.agg(
      min($"ts_us").as("tlo"), max($"ts_us").as("thi"),
      min($"user_id").as("ulo"), max($"user_id").as("uhi"))
    def zOf(df: DataFrame): DataFrame = {
      val bx = bucketExpr("ts_us", "tlo", "thi", "div")
      val by = bucketExpr("user_id", "ulo", "uhi", "div")
      val (cx, cy) = (s"least(${ZSide - 1}, greatest(0, $bx))",
        s"least(${ZSide - 1}, greatest(0, $by))")
      df.crossJoin(broadcast(stats))
        .withColumn("xb", expr(cx)).withColumn("yb", expr(cy))
        .withColumn("zval", expr(zExpr("xb", "yb", "div")))
    }
    val gstats = standingGstats(spark, dir)
    val lastG = gstats.agg(max($"granule").as("last_g"))
    val routed = zOf(delta)
      .select($"event_id", $"ts_us".as("d_ts"), $"user_id".as("d_uid"),
        $"zval".as("d_z"))
      .join(broadcast(gstats.select($"granule".as("rg"), $"zhi")),
        $"zhi" >= $"d_z", "left")
      .groupBy($"event_id", $"d_ts", $"d_uid")
      .agg(min($"rg").as("route_g"))
      .crossJoin(broadcast(lastG))
      .withColumn("g", coalesce($"route_g", $"last_g"))
    // widening: any routed row outside the granule's standing box
    val audit = routed
      .join(gstats, $"g" === $"granule")
      .groupBy($"granule")
      .agg(count(lit(1)).as("n_new"),
        sum(when($"d_ts" < $"ts_lo" || $"d_ts" > $"ts_hi" ||
          $"d_uid" < $"uid_lo" || $"d_uid" > $"uid_hi", 1L)
          .otherwise(0L)).as("n_widen"))
    gstats.select($"granule", $"n_base")
      .join(audit, Seq("granule"), "left")
      .select($"granule", $"n_base",
        coalesce($"n_new", lit(0L)).as("n_new"),
        coalesce($"n_widen", lit(0L)).as("n_widen"),
        (coalesce($"n_widen", lit(0L)) > 0).as("box_widened"))
  }

  private val incrementalSql: String = {
    val bx = bucketExpr("epoch_us(ts)", "tlo", "thi", "//")
    val by = bucketExpr("user_id", "ulo", "uhi", "//")
    val cbx = s"least(${ZSide - 1}, greatest(0, $bx))"
    val cby = s"least(${ZSide - 1}, greatest(0, $by))"
    s"""WITH st AS (SELECT min(epoch_us(ts)) AS tlo, max(epoch_us(ts)) AS thi,
       |             min(user_id) AS ulo, max(user_id) AS uhi
       |            FROM events WHERE event_id % $DeltaMod <> 0),
       |bz AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id,
       |         $bx AS xb, $by AS yb
       |       FROM events, st WHERE event_id % $DeltaMod <> 0),
       |bzz AS (SELECT *, ${zExpr("xb", "yb", "//")} AS zval FROM bz),
       |g AS (SELECT *, (row_number() OVER (ORDER BY zval, event_id) - 1)
       |               // $GranuleRows AS granule FROM bzz),
       |gs AS (SELECT granule, count(*) AS n_base,
       |         min(zval) AS zlo, max(zval) AS zhi,
       |         min(ts_us) AS ts_lo, max(ts_us) AS ts_hi,
       |         min(user_id) AS uid_lo, max(user_id) AS uid_hi
       |       FROM g GROUP BY 1),
       |lg AS (SELECT max(granule) AS last_g FROM gs),
       |dz AS (SELECT event_id, epoch_us(ts) AS d_ts, user_id AS d_uid,
       |         $cbx AS xb, $cby AS yb
       |       FROM events, st WHERE event_id % $DeltaMod = 0),
       |dzz AS (SELECT *, ${zExpr("xb", "yb", "//")} AS d_z FROM dz),
       |routed AS (
       |  SELECT d.event_id, d.d_ts, d.d_uid,
       |    coalesce(min(s.granule), max(lg.last_g)) AS g
       |  FROM dzz d LEFT JOIN gs s ON s.zhi >= d.d_z, lg
       |  GROUP BY 1, 2, 3),
       |audit AS (
       |  SELECT r.g AS granule, count(*) AS n_new,
       |    sum(CASE WHEN r.d_ts < s.ts_lo OR r.d_ts > s.ts_hi OR
       |                  r.d_uid < s.uid_lo OR r.d_uid > s.uid_hi
       |        THEN 1 ELSE 0 END)::BIGINT AS n_widen
       |  FROM routed r JOIN gs s ON s.granule = r.g GROUP BY 1)
       |SELECT gs.granule, gs.n_base,
       |  coalesce(a.n_new, 0)::BIGINT AS n_new,
       |  coalesce(a.n_widen, 0)::BIGINT AS n_widen,
       |  coalesce(a.n_widen, 0) > 0 AS box_widened
       |FROM gs LEFT JOIN audit a ON a.granule = gs.granule""".stripMargin
  }

  /** Multiplicative-hash mix for the partition diagnostic: Knuth's
    * 2654435761, middle bits taken so the low-bit permutation of a
    * small-modulus product does not masquerade as mixing. */
  private def pidExpr(d: String) =
    s"((user_id * 2654435761) $d 65536) % $Partitions"

  /** Rows and distinct keys per hash partition — the pre-flight balance
    * check for a partitioning key. `balance` = n_rows / fair share;
    * 1.0 everywhere means the key partitions evenly at [[Partitions]]
    * reducers (exact-integer inputs, so the rounded double matches). */
  private def partitionStatsDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tot = Tables.events(spark, dir).agg(count(lit(1)).as("total"))
    Tables.events(spark, dir)
      .withColumn("pid", expr(pidExpr("div")))
      .groupBy($"pid")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct($"user_id").as("n_keys"))
      .crossJoin(broadcast(tot))
      .withColumn("balance",
        round($"n_rows" * Partitions / $"total".cast("double"), 6))
      .select($"pid", $"n_rows", $"n_keys", $"balance")
  }

  private val partitionStatsSql: String =
    s"""WITH t AS (SELECT count(*) AS total FROM events)
       |SELECT ${pidExpr("//")} AS pid, count(*) AS n_rows,
       |  count(DISTINCT user_id) AS n_keys,
       |  round(count(*) * $Partitions / t.total::DOUBLE, 6) AS balance
       |FROM events, t GROUP BY 1, t.total""".stripMargin

  /** The planted-skew key: 'hot' on half the rows, eight cold keys on
    * the rest — deterministic from event_id, mirroring a real feed where
    * one instrument dominates. Shared with `join_salted`, which is the
    * JOIN-side rescue for the skew this key plants. */
  private[graft] def skewKeySql: String =
    "CASE WHEN event_id % 16 < 8 THEN 'hot' " +
      "ELSE concat('k', event_id % 16) END"

  /** Exact heavy-hitter census with the salting decision attached:
    * a key whose share exceeds [[HotFactor]]/[[Partitions]] concentrates
    * >HotFactor× a reducer's fair share on one task — route it through
    * `agg_salted`'s two-phase plan. Integer cross-multiplication keeps
    * the flag exact. */
  private def heavyHittersDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tot = Tables.events(spark, dir).agg(count(lit(1)).as("total"))
    Tables.events(spark, dir)
      .withColumn("skew_key", expr(skewKeySql))
      .groupBy($"skew_key")
      .agg(count(lit(1)).as("n_events"))
      .crossJoin(broadcast(tot))
      .withColumn("share", round($"n_events" / $"total".cast("double"), 6))
      .withColumn("salt_candidate",
        $"n_events" * Partitions > $"total" * HotFactor)
      .select($"skew_key", $"n_events", $"share", $"salt_candidate")
  }

  private val heavyHittersSql: String =
    s"""WITH t AS (SELECT count(*) AS total FROM events)
       |SELECT $skewKeySql AS skew_key, count(*) AS n_events,
       |  round(count(*) / t.total::DOUBLE, 6) AS share,
       |  count(*) * $Partitions > t.total * $HotFactor AS salt_candidate
       |FROM events, t GROUP BY 1, t.total""".stripMargin

  /** Deletion-cohort residue: user_id % [[ErasureMod]] == 0 plays the
    * right-to-be-forgotten request batch (the engine-wide residue-class
    * convention, like StatsDeltaMod). */
  val ErasureMod = 10L

  /** Erasure planning (`layout_erasure`) — the right-to-be-forgotten
    * audit a lakehouse runs BEFORE touching data: against the standing
    * Z-ordered layout, which granules contain any row of the deletion
    * cohort, how many rows each must drop, and how many innocent rows
    * ride along in the rewrite (copy-on-write amplification — the
    * number a compaction scheduler weighs against batching more
    * requests). The conditional count rides the same scan that builds
    * the layout rank, and the output is the granule frame — metadata-
    * sized at any data scale; in production the granule assignment is
    * already persisted, so this plan is a broadcast cohort join against
    * granule metadata, never a second scan of the table. */
  private def erasureDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    granuleByRank(zvalDf(spark, dir), $"zval", $"event_id")
      .groupBy($"granule")
      .agg(count(lit(1)).as("n_rows"),
        sum(when($"user_id" % ErasureMod === 0, 1L).otherwise(0L))
          .as("n_del"))
      .select($"granule", $"n_rows", $"n_del",
        ($"n_del" > 0).as("rewrite"),
        ($"n_rows" - $"n_del").as("n_keep"))
  }

  private val erasureSql: String =
    s"""WITH $zvalSqlBody,
       |g AS (SELECT *, (row_number() OVER (ORDER BY zval, event_id) - 1)
       |                // $GranuleRows AS granule FROM z)
       |SELECT granule, count(*) AS n_rows,
       |  sum(CASE WHEN user_id % $ErasureMod = 0 THEN 1 ELSE 0 END)::BIGINT
       |    AS n_del,
       |  sum(CASE WHEN user_id % $ErasureMod = 0 THEN 1 ELSE 0 END)::BIGINT > 0
       |    AS rewrite,
       |  (count(*) -
       |   sum(CASE WHEN user_id % $ErasureMod = 0 THEN 1 ELSE 0 END))::BIGINT
       |    AS n_keep
       |FROM g GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_erasure" -> (erasureDf(_, _)),
    "layout_zorder" -> (zorderDf(_, _)),
    "layout_prune" -> (pruneDf(_, _)),
    "layout_compaction" -> (compactionDf(_, _)),
    "layout_incremental" -> (incrementalDf(_, _)),
    "layout_bloom_prune" -> (bloomPruneDf(_, _)),
    "diag_partition_stats" -> (partitionStatsDf(_, _)),
    "diag_heavy_hitters" -> (heavyHittersDf(_, _))
  )

  val oracles: Map[String, String] = Map(
    "layout_erasure" -> erasureSql,
    "layout_zorder" -> zorderSql,
    "layout_prune" -> pruneSql,
    "layout_compaction" -> compactionSql,
    "layout_incremental" -> incrementalSql,
    "layout_bloom_prune" -> bloomPruneSql,
    "diag_partition_stats" -> partitionStatsSql,
    "diag_heavy_hitters" -> heavyHittersSql
  )
}
