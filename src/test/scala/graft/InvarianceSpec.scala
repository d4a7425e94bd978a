package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import graft.streaming.Streams.DeltaRow

/** SURVEY §5.4 property items: z-score shift/scale invariance and the
  * CVD clamp, checked through the engine's own operators. */
class InvarianceSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def runZ(deltas: Seq[Double]): Seq[Option[Double]] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val name = s"zinv_${deltas.hashCode.abs}"
    val input = MemoryStream[DeltaRow]
    val q = Streams.zscoreStream(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    input.addData(deltas.zipWithIndex.map { case (d, i) =>
      DeltaRow("S", ts(i * 10), d) })
    q.processAllAvailable()
    q.stop()
    spark.table(name).collect()
      .sortBy(_.getAs[Timestamp]("win_start").getTime)
      .map(r => Option(r.getAs[java.lang.Double]("z")).map(_.toDouble)).toSeq
  }

  test("session_gap_agg plans as native sort-based session merge, one shuffle") {
    val plan = graft.operators.Ingest
      .queries("session_gap_agg")(spark, sfDir())
      .queryExecution.executedPlan.toString
    // the gap semantics must lower to Spark's MergingSessions operator —
    // partial agg, ONE exchange on the grouping key, in-partition merge —
    // never a self-join or a global sort (PLANS.md "session_gap_agg")
    assert(plan.contains("MergingSessions"), s"no MergingSessions in:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      "session aggregation must not plan a join")
  }

  test("pipeline_pack plans bounded granule windows, never a global sort") {
    val plan = graft.operators.Pipeline
      .queries("pipeline_pack")(spark, sfDir())
      .queryExecution.executedPlan.toString
    // two-level packing (PLANS.md "pipeline_pack"): the heavy running-sum
    // window exchanges on (source, granule) — bounded partitions even
    // under a one-giant-source corpus — with the per-granule bases
    // broadcast back; a rangepartitioning exchange would mean a global
    // order crept in
    assert(plan.contains("hashpartitioning(source"),
      s"no source-hash exchange in:\n$plan")
    assert(plan.contains("bkt"),
      s"no granule key in the pack plan:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      "packing must not plan a global sort")
  }

  test("z-score is invariant under shift and positive scaling") {
    val rnd = new scala.util.Random(11)
    val base = (0 until 45).map(_ => rnd.nextDouble() * 10 - 5)
    val z0 = runZ(base)
    val zShift = runZ(base.map(_ + 1000.0))
    val zScale = runZ(base.map(_ * 37.5))
    assert(z0.count(_.isDefined) > 10)
    z0.zip(zShift).foreach {
      case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-7,
        s"shift changed z: $a vs $b")
      case (a, b) => assert(a == b)
    }
    z0.zip(zScale).foreach {
      case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9)
      case (a, b) => assert(a == b)
    }
  }

  test("CVD is clamped to [-1, 1] and zero-volume-safe on real data") {
    val rows = rowsOf(graft.operators.Flow.queries("flow_cvd")(spark, sfDir()))
    assert(rows.nonEmpty)
    rows.foreach { m =>
      val v = m("cvd").asInstanceOf[Double]
      assert(v >= -1.0 && v <= 1.0)
    }
  }

  test("scores are invariant to the query evaluation order (memoized frame)") {
    // calling entries before fusion must give the same frame as the
    // reverse order — the DfMemo must not leak staleness across queries
    val a = rowsOf(graft.operators.Scores.queries("entry_signals")(spark, sfDir()))
    val b = rowsOf(graft.operators.Scores.queries("fusion_scores")(spark, sfDir()))
      .filter(_("side") != "NONE")
    assert(a.size == b.size)
  }

  test("phash family: every consumer of the signature memo agrees with it") {
    // five queries share media_phash:<dir>; the survivorship and
    // incremental screens must be consistent VIEWS of the same hashes,
    // not artifacts of evaluation order
    val P = graft.operators.Phash
    val keep = rowsOf(P.queries("media_keep")(spark, sfDir("sf0.001")))
      .map(m => m("doc_id").asInstanceOf[Long] ->
        m("media_keep").asInstanceOf[Boolean]).toMap
    val inc = rowsOf(P.queries("media_incremental")(spark, sfDir("sf0.001")))
      .map(m => m("media_id").asInstanceOf[Long] -> m).toMap
    val sig = rowsOf(P.queries("media_phash")(spark, sfDir("sf0.001")))
      .filter(_("variant") == 0L)
      .map(m => m("media_id").asInstanceOf[Long] ->
        m("phash").asInstanceOf[Long]).toMap
    // cross-view consistency: a delta doc whose exact base twin has a
    // SMALLER id cannot survive the min-id keeper — the two screens
    // must read the same memoized hashes, whatever order they ran in
    inc.foreach { case (id, m) =>
      if (m("verdict") == "exact_dup") {
        val smallerTwin = sig.exists { case (j, h) =>
          j < id && h == sig(id) }
        if (smallerTwin)
          assert(!keep(id), s"delta doc $id kept past a smaller exact twin")
      }
    }
    assert(inc.nonEmpty && keep.nonEmpty)
  }

  test("one-scan claims hold in the physical plan") {
    // ml_kfold's whole point is "K folds, ONE scan": every training set
    // is the integer complement of its held fold, so a second fact scan
    // in the plan would falsify the design. Same single-pass claim for
    // the OLS normal equations and the census-collapsed Lorenz/range-vol.
    def scans(q: String): Int = {
      val plan = SparkEntry.queries(q)(spark, sfDir())
        .queryExecution.executedPlan.toString
      "Scan parquet".r.findAllIn(plan).length
    }
    assert(scans("ml_kfold") == 1, "kfold must read lineitem once")
    assert(scans("ml_ols") == 1, "ols must read lineitem once")
    assert(scans("events_lorenz") == 1, "lorenz must read events once")
    assert(scans("bars_range_vol") == 1, "range vol must read events once")
    // column pruning reaches the kfold scan: 4 columns, not the table
    val kplan = SparkEntry.queries("ml_kfold")(spark, sfDir())
      .queryExecution.executedPlan.toString
    assert(kplan.contains("l_orderkey") && !kplan.contains("l_shipdate"),
      s"kfold scan must prune to the 4 used columns:\n$kplan")
  }

  test("integer-exact analytics are invariant to the shuffle partition count") {
    // partition-count independence IS the distributed-correctness
    // property: a plan whose answer moves when the cluster width changes
    // is wrong at every width. Integer-surface queries only — a double
    // aggregate may legitimately wobble in its last ulp with summation
    // order (which is why those queries quantize for the oracle).
    val qs = Seq("events_funnel", "events_dau_wau", "events_k_anon",
      "pipeline_length_buckets", "dedup_lsh_curve",
      // round-10 integer-exact additions: the iterative graph pair, the
      // keyed CUSUM fold, and the all-integer anomaly census
      "graph_pagerank", "graph_triangles", "flow_cusum", "events_anomaly",
      // round-11: streaks/lorenz/survival counters and the confusion census
      "events_streaks", "events_lorenz", "events_survival", "ml_logreg_eval")
    // The regression family makes a STRONGER claim: every double output
    // derives from order-independent integer sums through a fixed op
    // sequence, so even the doubles must be bit-identical at any width.
    val exactDoubleQs = Seq("ml_ols", "ml_kfold", "ml_logreg",
      "events_did", "bars_range_vol",
      // late round-11: survival's exp over integer window sums, the
      // cents-built microprice, the all-integer LTV curve, and the
      // tick-test accuracy rate are equally width-independent
      "events_survival", "book_microprice", "orders_cohort_ltv",
      "flow_tick_rule")
    def snap(): Map[String, Set[Map[String, Any]]] =
      (qs.map(q => q ->
        rowsOf(SparkEntry.queries(q)(spark, sfDir())).map(_.filter {
          case (_, _: java.lang.Double) => false
          case _ => true
        }).toSet) ++
        exactDoubleQs.map(q => q ->
          rowsOf(SparkEntry.queries(q)(spark, sfDir())).toSet)).toMap
    val conf = spark.conf
    val prev = conf.get("spark.sql.shuffle.partitions")
    val base = snap()
    conf.set("spark.sql.shuffle.partitions", "7")
    // drop the DfMemo checkpoints built during the base snapshot:
    // memoized chains (the logistic Newton passes, knn-backed frames)
    // would otherwise serve the narrow run from the 32-partition
    // materialization and the width-invariance claim would be vacuous
    graft.functions.DfMemo.clear()
    try {
      val narrow = snap()
      (qs ++ exactDoubleQs).foreach { q =>
        assert(narrow(q) === base(q), s"$q moved with the partition count")
      }
    } finally conf.set("spark.sql.shuffle.partitions", prev)
    assert(base.values.forall(_.nonEmpty))
  }
}
