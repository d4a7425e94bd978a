package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.operators.{Audit, Pipeline}

/** Table-service family: integrity audit + optimizer statistics. */
class AuditSpec extends SparkSpec {

  private val dir = sfDir() // sf0.001

  test("audit_integrity: the driver star schema is clean — zeros are the audit") {
    val rows = rowsOf(SparkEntry.queries("audit_integrity")(spark, dir))
    assert(rows.size === 8)
    rows.foreach { r =>
      assert(r("n_violations") === 0L, s"unexpected violations in ${r("check")}")
      assert(r("n_checked").asInstanceOf[Long] > 0L)
    }
  }

  test("audit_integrity: every check fires on planted violations") {
    import spark.implicits._
    val fix = java.nio.file.Files.createTempDirectory("graft_audit").toString
    Seq((1L, 10L), (2L, 10L), (2L, 99L)) // dup key 2; custkey 99 orphaned
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$fix/orders.parquet")
    Seq(10L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$fix/customer.parquet")
    // qty 60 out of range; price -1; null orderkey; orderkey 5 orphaned
    // (the null key is BOTH a notnull violation and, by SQL anti-join
    // semantics, an fk orphan — never equal to any referenced key)
    val liSchema = StructType(Seq(
      StructField("l_orderkey", LongType, nullable = true),
      StructField("l_quantity", DoubleType, nullable = false),
      StructField("l_extendedprice", DoubleType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(java.lang.Long.valueOf(1L), 5.0, 100.0),
        Row(java.lang.Long.valueOf(2L), 60.0, 10.0),
        Row(java.lang.Long.valueOf(5L), 10.0, -1.0),
        Row(null, 3.0, 1.0)),
      liSchema)
      .write.mode("overwrite").parquet(s"$fix/lineitem.parquet")
    val evSchema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("ts", LongType, nullable = false), // nanos convention
      StructField("user_id", LongType, nullable = true),
      StructField("event_type", StringType, nullable = false),
      StructField("value", DoubleType, nullable = false),
      StructField("props", StringType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, 1700000000000000000L, java.lang.Long.valueOf(7L), "click", 1.0, "{}"),
        Row(2L, 1700000001000000000L, null, "view", 1.0, "{}"),
        Row(3L, 1500000000000000000L, java.lang.Long.valueOf(8L), "click", 1.0, "{}")), // 2017: out of window
      evSchema)
      .write.mode("overwrite").parquet(s"$fix/events.parquet")

    val got = rowsOf(SparkEntry.queries("audit_integrity")(spark, fix))
      .map(r => r("check") -> r("n_violations")).toMap
    assert(got("orders_pk_unique") === 1L)
    assert(got("orders_custkey_fk") === 1L)
    assert(got("lineitem_qty_in_1_50") === 1L)
    assert(got("lineitem_price_nonneg") === 1L)
    assert(got("lineitem_orderkey_notnull") === 1L)
    assert(got("lineitem_orderkey_fk") === 2L) // orphan 5 + the null key
    assert(got("events_user_notnull") === 1L)
    assert(got("events_ts_in_window") === 1L)
    graft.functions.Fs.deleteRecursively(new java.io.File(fix))
  }

  test("stats_columns: one pass yields exact ndv/nulls/min/max per column") {
    import spark.implicits._
    val rows = rowsOf(SparkEntry.queries("stats_columns")(spark, dir))
    assert(rows.map(_("column")).toSet ===
      graft.operators.Audit.StatCols.toSet)
    rows.foreach { r =>
      assert(r("ndv").asInstanceOf[Long] > 0L)
      assert(r("n_nulls") === 0L)
      assert(r("vmin").asInstanceOf[Double] <= r("vmax").asInstanceOf[Double])
    }
    // spot-check one column against a direct computation
    val q = rows.find(_("column") == "l_quantity").get
    val direct = graft.sources.Tables.lineitem(spark, dir)
      .agg(countDistinct($"l_quantity"), min($"l_quantity"), max($"l_quantity"))
      .head()
    assert(q("ndv") === direct.getLong(0))
    assert(q("vmin") === direct.getDouble(1))
    assert(q("vmax") === direct.getDouble(2))
  }

  test("stats_columns sketch branch: same schema as exact, sub-k " +
    "columns exact, estimates inside the k-bound error") {
    // the above-StatsExactMaxRows default plan, forced directly (the
    // spec SF sits below the threshold, where the dispatcher is exact)
    val exact = SparkEntry.queries("stats_columns")(spark, dir)
    val sk = Audit.statsSketchDf(spark, dir)
    assert(sk.schema.map(f => (f.name, f.dataType)) ===
      exact.schema.map(f => (f.name, f.dataType)))
    val exByCol = rowsOf(exact)
      .map(r => r("column") -> r("ndv").asInstanceOf[Long]).toMap
    rowsOf(sk).foreach { r =>
      val c = r("column").asInstanceOf[String]
      val est = r("ndv").asInstanceOf[Long]
      val ex = exByCol(c)
      if (ex < Audit.KmvColK)
        assert(est === ex, s"$c: below k the sketch IS the count")
      else
        assert(math.abs(est - ex).toDouble / ex <
          3.0 / math.sqrt(Audit.KmvColK - 2.0),
          s"$c estimate $est vs exact $ex outside 3 sigma")
    }
  }

  test("kmv ndv sketch: sub-k columns exact, estimates inside the " +
    "k-bound error") {
    val rows = rowsOf(Audit.queries("stats_columns_kmv")(spark, sfDir()))
    assert(rows.map(_("column")).toSet === Audit.KmvCols.toSet)
    rows.foreach { r =>
      val exact = r("n_exact").asInstanceOf[Long]
      val est = r("est_ndv").asInstanceOf[Double]
      val err = r("rel_err").asInstanceOf[Double]
      assert(math.abs(err - math.abs(est - exact) / exact) < 1e-4)
      if (exact < Audit.KmvColK)
        assert(est === exact.toDouble, "below k the sketch IS the count")
      else
        // KMV stderr ≈ 1/sqrt(k-2); 3 sigma with k=256 is ~0.19
        assert(err < 3.0 / math.sqrt(Audit.KmvColK - 2.0),
          s"${r("column")} error $err outside 3 sigma")
    }
  }

  test("corr stats: bounded coefficients over the full table, one " +
    "pair cross-checked") {
    import spark.implicits._
    val rows = rowsOf(Audit.queries("stats_corr")(spark, sfDir()))
    assert(rows.size === 4)
    val n = graft.sources.Tables.lineitem(spark, sfDir()).count()
    rows.foreach { r =>
      assert(r("n_rows") === n)
      val c = r("corr_r").asInstanceOf[Double]
      assert(c >= -1.0 && c <= 1.0)
    }
    val direct = graft.sources.Tables.lineitem(spark, sfDir())
      .agg(corr($"l_quantity", $"l_extendedprice")).head().getDouble(0)
    val got = rows.find(r => r("col_a") == "l_quantity" &&
      r("col_b") == "l_extendedprice").get("corr_r").asInstanceOf[Double]
    assert(math.abs(got - direct) < 1e-6)
  }

  test("k-anon release gate publishes only cells with k distinct users") {
    val dir = sfDir()
    val rows = rowsOf(Audit.queries("events_k_anon")(spark, dir))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r("released").asInstanceOf[Boolean]) {
        assert(r("n_users_pub").asInstanceOf[Long] >= Audit.KAnon)
        assert(r("n_events_pub").asInstanceOf[Long] >=
          r("n_users_pub").asInstanceOf[Long])
      } else {
        assert(r("n_users_pub") == null && r("n_events_pub") == null,
          "suppressed cells must publish no counts")
      }
    }
    // the grid is complete: published event mass never exceeds the
    // total, and every (type, hour) with events has a verdict row
    val total = rowsOf(graft.sources.Tables.events(spark, dir)
      .agg(count(lit(1)).as("n"))).head("n").asInstanceOf[Long]
    val pub = rows.flatMap(r => Option(r("n_events_pub"))
      .map(_.asInstanceOf[Long])).sum
    assert(pub <= total)
    val cells = rowsOf(graft.sources.Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr(s"ts_us div ${Audit.HourUs}").as("hour"))
      .agg(count(lit(1)).as("n"))).size
    assert(rows.size === cells)
  }

  test("events_winsorize: cuts are real order statistics, clamp census exact") {
    import org.apache.spark.sql.functions._
    val out = rowsOf(Audit.queries("events_winsorize")(spark, dir))
      .map(m => m("event_type").asInstanceOf[String] -> m).toMap
    assert(out.nonEmpty)
    val raw = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    raw.foreach { case (t, xs) =>
      val m = out(t)
      val n = xs.length
      val lo = xs(math.ceil(n * 0.01).toInt - 1)
      val hi = xs(math.ceil(n * 0.99).toInt - 1)
      assert(m("n") == n.toLong)
      assert(m("p1_cents") == lo && m("p99_cents") == hi, t)
      assert(m("n_clip_lo") == xs.count(_ < lo).toLong)
      assert(m("n_clip_hi") == xs.count(_ > hi).toLong)
      val wsum = xs.map(x => math.max(lo, math.min(hi, x))).sum
      assert(m("winsor_mean_cents") ==
        math.floor(wsum.toDouble / n).toLong)
      // winsorized mean sits inside the cut band
      val wm = m("winsor_mean_cents").asInstanceOf[Long]
      assert(wm >= lo && wm <= hi)
    }
  }

  test("events_mad_outliers: hand-computed median/MAD census; robust to the outlier itself") {
    // values 1..9 plus one wild 100: median 5.5, adev median (MAD) 2.5,
    // threshold 3·1.4826·2.5 = 11.1195 — only the 100 (adev 94.5) trips
    val fix = writeEventsFixture((1 to 9).map { i =>
      (i.toLong, i * 1000000000L, i.toLong, "click", i.toDouble)
    } :+ (10L, 10000000000L, 10L, "click", 100.0))
    val r = rowsOf(Audit.queries("events_mad_outliers")(spark, fix))
    assert(r.size === 1)
    val m = r.head
    assert(m("n") === 10L)
    assert(m("med") === 5.5)
    assert(m("mad") === 2.5)
    assert(m("n_outliers") === 1L)
    // corpus invariants: MAD nonneg, outliers a strict minority per type
    val sf = rowsOf(Audit.queries("events_mad_outliers")(spark, dir))
    assert(sf.nonEmpty)
    sf.foreach { m =>
      assert(m("mad").asInstanceOf[Double] >= 0.0)
      val (n, o) = (m("n").asInstanceOf[Long],
        m("n_outliers").asInstanceOf[Long])
      assert(o >= 0L && o * 2 < n)
    }
    graft.functions.Fs.deleteRecursively(new java.io.File(fix))
  }

  test("stats_incremental: the base⊕delta sketch merge equals the full recompute") {
    val rows = rowsOf(SparkEntry.queries("stats_incremental")(spark, dir))
    assert(rows.map(_("column")).toSet ===
      Set("l_orderkey", "l_partkey", "l_suppkey"))
    rows.foreach { r =>
      // the mergeability identity holds on real data, per column: the
      // kth-minimum of the merged sketch IS the full table's, so the
      // estimates agree exactly — maintenance under append never needs
      // the standing table re-scanned
      assert(r("merged_equals_full").asInstanceOf[Boolean],
        s"${r("column")}: merged sketch diverged from full recompute")
      assert(r("est_merged") === r("est_full"))
    }
  }

  test("pipeline_release_diff: statuses partition both releases, deltas signed right") {
    import spark.implicits._
    val rows = rowsOf(SparkEntry.queries("pipeline_release_diff")(spark, dir))
    val byStatus = rows.groupBy(_("status").asInstanceOf[String])
      .view.mapValues(_.map(_("n_docs").asInstanceOf[Long]).sum).toMap
    val ids = graft.sources.Tables.documents(spark, dir)
      .select(($"doc_id" % Pipeline.ReleaseMod).as("r"))
      .groupBy($"r").count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // the residue dials say exactly which docs land where
    assert(byStatus("removed") === ids(0L))
    assert(byStatus("added") === ids(3L))
    assert(byStatus("changed") === ids(6L))
    assert(byStatus("unchanged") ===
      ids.filterKeys(k => k != 0L && k != 3L && k != 6L).values.sum)
    // mass deltas: removed strictly negative, added strictly positive,
    // changed positive (the revision appends), unchanged exactly zero
    rows.foreach { r =>
      val d = r("char_delta").asInstanceOf[Long]
      r("status") match {
        case "removed" => assert(d < 0L)
        case "added" => assert(d > 0L)
        case "changed" => assert(d > 0L)
        case _ => assert(d === 0L)
      }
    }
  }
}
