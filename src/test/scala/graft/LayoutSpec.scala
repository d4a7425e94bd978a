package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Data-layout family: Z-order clustering, granule pruning, partition
  * diagnostics, and the bucketed co-located join. */
class LayoutSpec extends SparkSpec {

  private val dir = sfDir() // sf0.001

  test("zorder two-level granule rank equals the single-window rank") {
    import spark.implicits._
    val base = Layout.zvalDf(spark, dir)
    val twoLevel = Layout.granuleByRank(base, $"zval", $"event_id")
      .select($"event_id", $"granule")
    val direct = base
      .withColumn("granule",
        expr(s"(row_number() OVER (ORDER BY zval, event_id) - 1) div ${Layout.GranuleRows}"))
      .select($"event_id", col("granule").as("g2"))
    val joined = twoLevel.join(direct, "event_id")
    assert(joined.filter($"granule" =!= $"g2").count() === 0)
  }

  test("layout_zorder: granule stats are true bounds and partition the table") {
    import spark.implicits._
    val stats = SparkEntry.queries("layout_zorder")(spark, dir)
    val total = graft.sources.Tables.events(spark, dir).count()
    val agg = stats.agg(sum($"n_rows"), max($"n_rows"), count(lit(1))).head()
    assert(agg.getLong(0) === total)
    assert(agg.getLong(1) <= Layout.GranuleRows)
    // bounds are true bounds: re-derive membership and check containment
    val membered = Layout.granuleByRank(
      Layout.zvalDf(spark, dir), $"zval", $"event_id")
    val violated = membered.join(stats, "granule")
      .filter($"ts_us" < $"ts_lo" || $"ts_us" > $"ts_hi" ||
        $"user_id" < $"uid_lo" || $"user_id" > $"uid_hi")
    assert(violated.count() === 0)
  }

  test("layout_erasure: the plan partitions every granule and prices the rewrite") {
    import spark.implicits._
    val plan = rowsOf(Layout.queries("layout_erasure")(spark, dir))
    val ev = graft.sources.Tables.events(spark, dir)
    val total = ev.count()
    val cohort = ev.filter($"user_id" % Layout.ErasureMod === 0).count()
    // the plan partitions the table: every row is kept or deleted, once
    assert(plan.map(_("n_rows").asInstanceOf[Long]).sum === total)
    assert(plan.map(_("n_del").asInstanceOf[Long]).sum === cohort)
    plan.foreach { g =>
      val (n, d, k) = (g("n_rows").asInstanceOf[Long],
        g("n_del").asInstanceOf[Long], g("n_keep").asInstanceOf[Long])
      assert(d + k === n)
      assert(g("rewrite") === (d > 0))
    }
    // copy-on-write amplification is real and measurable: rewritten
    // granules drag innocent rows, so rewritten mass strictly exceeds
    // the cohort (the Z-layout clusters by (time, user), and a ~10%
    // user cohort touches most granules)
    val rewrittenRows = plan.filter(_("rewrite") == true)
      .map(_("n_rows").asInstanceOf[Long]).sum
    assert(cohort > 0 && rewrittenRows > cohort,
      s"amplification vanished: $rewrittenRows rewritten for $cohort deleted")
  }

  test("layout_prune: zorder skips strictly more granules than time-sort " +
    "and both layouts select the same rows") {
    import spark.implicits._
    val rows = rowsOf(SparkEntry.queries("layout_prune")(spark, dir))
    assert(rows.size === 2)
    val byLayout = rows.map(r => r("layout") -> r).toMap
    val z = byLayout("zorder")
    val t = byLayout("time_sorted")
    assert(z("rows_selected") === t("rows_selected"))
    assert(z("granules_total") === t("granules_total"))
    assert(z("granules_scanned").asInstanceOf[Long] <
      t("granules_scanned").asInstanceOf[Long])
    // scanned granules can hold every selected row (soundness floor):
    // selected rows / granule capacity <= granules scanned
    val sel = z("rows_selected").asInstanceOf[Long]
    assert(z("granules_scanned").asInstanceOf[Long] * Layout.GranuleRows >= sel)
  }

  test("diag_heavy_hitters flags the planted hot key and only it") {
    val rows = rowsOf(SparkEntry.queries("diag_heavy_hitters")(spark, dir))
    val hot = rows.filter(_("salt_candidate").asInstanceOf[Boolean])
    assert(hot.map(_("skew_key")) === Seq("hot"))
    val share = hot.head("share").asInstanceOf[Double]
    assert(share >= 0.5 && share < 0.51) // 1000 % 16 != 0 at sf0.001
    assert(rows.size === 9) // hot + k8..k15
  }

  test("diag_partition_stats: the multiplicative mix balances user_id " +
    "across all 32 partitions") {
    // fixture with keys >> partitions: 320 users x 10 rows, so the
    // diagnostic's balanced-case face is checkable (the sf data has only
    // ~15 users at sf0.001 — there the SAME query correctly reports <=15
    // occupied partitions, the real decision it exists to surface)
    val fix = writeEventsFixture((0 until 3200).map { i =>
      (i.toLong, 1700000000000000000L + i * 1000000000L, (i % 320).toLong,
        "click", 1.0)
    })
    val rows = rowsOf(SparkEntry.queries("diag_partition_stats")(spark, fix))
    assert(rows.map(_("n_rows").asInstanceOf[Long]).sum === 3200L)
    assert(rows.size === 32) // every partition occupied
    // mid-bit mix spreads sequential keys 7..13 per bucket -> balance
    // within [0.7, 1.3] of fair share on this fixture
    assert(rows.forall { r =>
      val b = r("balance").asInstanceOf[Double]; b >= 0.69 && b <= 1.31
    })
    // and on the sf data the key-starved face: no partition can hold
    // more than one of the ~15 distinct users
    val sf = rowsOf(SparkEntry.queries("diag_partition_stats")(spark, dir))
    assert(sf.size <= 32)
    assert(sf.map(_("n_keys").asInstanceOf[Long]).sum ===
      graft.sources.Tables.events(spark, dir)
        .select("user_id").distinct().count())
  }

  test("bucketed tables co-locate: the orderkey join plans with zero shuffle") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    val abt = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the one-time layout write: 8 buckets, sorted within each, so the
      // join below needs neither Exchange nor Sort at read time
      graft.sources.Tables.orders(spark, dir)
        .write.mode("overwrite").option("path", s"$wh/orders_b")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      graft.sources.Tables.lineitem(spark, dir)
        .write.mode("overwrite").option("path", s"$wh/lineitem_b")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          $"o_orderkey" === $"l_orderkey")
      val plan = joined.queryExecution.executedPlan
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      val smj = plan.collect { case j: SortMergeJoinExec => j }
      assert(shuffles.isEmpty,
        s"bucketed join must not shuffle:\n${plan.treeString}")
      assert(smj.nonEmpty)
      // and it computes the same join as the unbucketed plan
      val expected = graft.sources.Tables.orders(spark, dir)
        .join(graft.sources.Tables.lineitem(spark, dir),
          $"o_orderkey" === $"l_orderkey").count()
      assert(joined.count() === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
      graft.functions.Fs.deleteRecursively(new java.io.File(wh))
    }
  }

  test("layout_compaction: groups are contiguous in Z, preserve rows, " +
    "and reach the target fill") {
    import spark.implicits._
    val plan = SparkEntry.queries("layout_compaction")(spark, dir)
    val rows = rowsOf(plan.orderBy($"granule"))
    val total = graft.sources.Tables.events(spark, dir).count()
    assert(rows.map(_("n_rows").asInstanceOf[Long]).sum === total)
    // groups are monotone over the zval-ordered granule stream: merging
    // only adjacent granules keeps output bounding boxes tight
    val groups = rows.map(_("compact_group").asInstanceOf[Long])
    assert(groups === groups.sorted)
    // every output file except the last reaches the target fill within
    // one source granule's slack (greedy cut on cumulative rows)
    val totals = rows.groupBy(_("compact_group").asInstanceOf[Long])
      .view.mapValues(_.map(_("n_rows").asInstanceOf[Long]).sum).toMap
    val last = totals.keys.max
    totals.filter(_._1 != last).values.foreach { t =>
      assert(t > Layout.CompactTargetRows - Layout.GranuleRows &&
        t < Layout.CompactTargetRows + Layout.GranuleRows)
    }
  }

  test("executed compaction closes the lifecycle: append-degraded pruning " +
    "is restored by the metadata-planned z-rewrite") {
    import spark.implicits._
    // sf0.01: enough granules (~196) that scan fractions are stable —
    // at sf0.001's ~20 granules the box geometry dominates the signal
    val base = Layout.zvalDf(spark, sfDir("sf0.01"))
    def statsOf(rows: org.apache.spark.sql.DataFrame) =
      rows.groupBy($"granule").agg(
        count(lit(1)).as("n_rows"),
        min($"ts_us").as("ts_lo"), max($"ts_us").as("ts_hi"),
        min($"user_id").as("uid_lo"), max($"user_id").as("uid_hi"),
        first($"tlo").as("tlo"), first($"thi").as("thi"),
        first($"ulo").as("ulo"), first($"uhi").as("uhi"))
    def pruneFraction(stats: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = Layout.boxScanDf(stats)
        .agg(count(lit(1)), sum(when($"scan", 1L).otherwise(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    def assertSound(rows: org.apache.spark.sql.DataFrame,
        stats: org.apache.spark.sql.DataFrame): Unit = {
      val missed = rows.filter(Layout.boxRowPred)
        .join(Layout.boxScanDf(stats).select($"granule", $"scan"), "granule")
        .filter(!$"scan").count()
      assert(missed === 0L, "a selected row lives in an unscanned granule")
    }
    // WRITE: the standing 80% is z-ordered; a 20% delta arrived later in
    // event order (the natural append path) as its own granules
    val standing = Layout.granuleByRank(
      base.filter($"event_id" % 5 =!= 0), $"zval", $"event_id")
    val offset = standing.agg(max($"granule")).head().getLong(0) + 1L
    val delta = Layout.granuleByRank(
      base.filter($"event_id" % 5 === 0), lit(0L), $"event_id")
      .withColumn("granule", $"granule" + offset)
    val written = standing.unionByName(delta).localCheckpoint()
    val fragStats = statsOf(written).localCheckpoint()
    // PRUNE: arrival-ordered delta granules span the whole user domain,
    // so they are unskippable — the degraded state OPTIMIZE exists for
    val (nFrag, sFrag) = pruneFraction(fragStats)
    assertSound(written, fragStats)
    // (arrival order correlates with ts, so a delta granule can still
    // skip on the TIME face of the box — but its user_id box is the whole
    // domain, so its scan fraction is far worse than the z-granules')
    val scanByKind = Layout.boxScanDf(fragStats)
      .groupBy(($"granule" >= offset).as("is_delta"))
      .agg((sum(when($"scan", 1.0).otherwise(0.0)) / count(lit(1)))
        .as("frac"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(scanByKind(true) > scanByKind(false),
      s"arrival granules should prune worse than z-granules: $scanByKind")
    // OPTIMIZE (planned on METADATA only): flag granules whose user_id
    // box spans more than half the domain relative to a z-granule's —
    // computable from the stats frame alone, like a table service
    // picking files to rewrite
    val rewriteIds = Layout.boxScanDf(fragStats)
      .filter(($"uid_hi" - $"uid_lo") * 2L > ($"uhi" - $"ulo"))
      .select($"granule").localCheckpoint()
    val nRewrite = rewriteIds.count()
    assert(nRewrite > 0L, "the planner should flag the append granules")
    // EXECUTE: re-granule ONLY the flagged granules' rows in z-order and
    // re-emit their stats; untouched granules keep their stats rows
    val rewritten = Layout.granuleByRank(
      written.join(rewriteIds, Seq("granule")).drop("granule"),
      $"zval", $"event_id")
      .withColumn("granule", $"granule" + 2L * offset)
    val kept = written.join(rewriteIds, Seq("granule"), "left_anti")
    val after = kept.unionByName(rewritten).localCheckpoint()
    val afterStats = statsOf(after).localCheckpoint()
    // RE-PRUNE: strictly better scan fraction, rows conserved, still sound
    val (nAfter, sAfter) = pruneFraction(afterStats)
    assertSound(after, afterStats)
    assert(after.count() === written.count(), "the rewrite must conserve rows")
    assert(sAfter.toDouble / nAfter < sFrag.toDouble / nFrag,
      s"optimize must improve pruning: $sFrag/$nFrag -> $sAfter/$nAfter")
    info(s"prune fraction: $sFrag/$nFrag fragmented -> $sAfter/$nAfter optimized")
  }

  test("z-bucket partitioned write: a box predicate prunes partitions " +
    "at the Spark scan") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_zwrite").toString
    try {
      // the layout write: coarse z-bucket (zval div 16 -> 16 dirs) as the
      // partition column — Catalyst's own directory pruning then serves
      // the same skipping the granule-stats frame models
      Layout.zvalDf(spark, dir)
        .withColumn("zbucket", expr("zval div 16"))
        .write.mode("overwrite").partitionBy("zbucket")
        .parquet(s"$out/events_z")
      val read = spark.read.parquet(s"$out/events_z")
      // predicate on the bucket: only matching directories are scanned
      val q = read.filter($"zbucket" === 3 || $"zbucket" === 7)
      val scan = q.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scan.nonEmpty)
      assert(scan.head.relation.partitionSchema.fieldNames.contains("zbucket"))
      val parts = scan.head.selectedPartitions.partitionCount
      assert(parts === 2, s"expected 2 of 16 partitions scanned, got $parts")
      // and the pruned read returns exactly the rows of those buckets
      val expected = Layout.zvalDf(spark, dir)
        .filter(expr("zval div 16 = 3 OR zval div 16 = 7")).count()
      assert(q.count() === expected)
    } finally {
      graft.functions.Fs.deleteRecursively(new java.io.File(out))
    }
  }

  test("layout_incremental: every delta row routes once; widening " +
    "reconciles with the boxes") {
    import spark.implicits._
    val rows = rowsOf(SparkEntry.queries("layout_incremental")(spark, dir))
    val ev = graft.sources.Tables.events(spark, dir)
    val nDelta = ev.filter($"event_id" % Layout.DeltaMod === 0).count()
    val nBase = ev.filter($"event_id" % Layout.DeltaMod =!= 0).count()
    assert(rows.map(_("n_new").asInstanceOf[Long]).sum === nDelta)
    assert(rows.map(_("n_base").asInstanceOf[Long]).sum === nBase)
    rows.foreach { r =>
      assert(r("box_widened") ===
        (r("n_widen").asInstanceOf[Long] > 0L))
      assert(r("n_widen").asInstanceOf[Long] <=
        r("n_new").asInstanceOf[Long])
    }
    // the standing layout still partitions the base exactly
    assert(rows.map(_("n_base").asInstanceOf[Long]).max <=
      Layout.GranuleRows)
  }

  test("layout_bloom_prune: no false negatives, bloom never scans more than the zone map") {
    // sf0.01: enough granules/probes for the aggregate win to be strict
    val rows = rowsOf(
      SparkEntry.queries("layout_bloom_prune")(spark, sfDir("sf0.01")))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mm, bl, tr, miss) = (
        r("scanned_minmax").asInstanceOf[Long],
        r("scanned_bloom").asInstanceOf[Long],
        r("n_true").asInstanceOf[Long],
        r("n_missed").asInstanceOf[Long])
      // the Bloom guarantee: every granule truly containing the probe
      // is scanned (a skipped true granule would DROP ROWS at read time)
      assert(miss === 0L, s"probe ${r("user_id")} skipped $miss true granules")
      assert(bl >= tr, "bloom∧zone must cover every true granule")
      // the index composes: bloom∧zone can only SHRINK the zone-map scan
      assert(bl <= mm, "bloom must never scan beyond the zone map")
      assert(tr > 0L, "every probe key occurs somewhere")
    }
    // across the probe set the bloom strictly beats the zone map — the
    // point of paying for the extra index on a point-lookup workload
    val totalMm = rows.map(_("scanned_minmax").asInstanceOf[Long]).sum
    val totalBl = rows.map(_("scanned_bloom").asInstanceOf[Long]).sum
    assert(totalBl < totalMm,
      s"expected a strict aggregate win: bloom $totalBl vs zone $totalMm")
  }

  test("text_fertility: every language has fertility >= 1 and consistent sums") {
    val rows = rowsOf(SparkEntry.queries("text_fertility")(spark, dir))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r("fertility").asInstanceOf[Double] >= 1.0,
        s"subword count below word count for ${r("lang")}")
      assert(r("n_chars").asInstanceOf[Long] >=
        r("n_subwords").asInstanceOf[Long])
    }
    val langs = graft.sources.Tables.documents(spark, dir)
      .select("lang").distinct().count()
    assert(rows.size.toLong === langs)
  }
}
