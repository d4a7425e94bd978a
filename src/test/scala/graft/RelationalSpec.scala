package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.sources.Tables

/** Join/agg family semantics cross-checked in-engine (the DuckDB oracle
  * covers exact values; these assert the relational invariants). */
class RelationalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // collect() yields java.sql.Timestamp or java.time.LocalDateTime
  // depending on spark.sql.datetime.java8API.enabled — normalize
  private def ldt(a: Any): java.time.LocalDateTime = a match {
    case t: java.sql.Timestamp => t.toLocalDateTime
    case l: java.time.LocalDateTime => l
  }

  test("semi + anti partition orders exactly") {
    import spark.implicits._
    val o = Tables.orders(spark, dir).count()
    val semi = Relational.queries("join_semi")(spark, dir).count()
    val lWithR = Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === "R").select($"l_orderkey").distinct()
    val expectSemi = Tables.orders(spark, dir)
      .join(lWithR, $"o_orderkey" === $"l_orderkey").count()
    assert(semi == expectSemi)
    assert(semi <= o)
  }

  test("as-of join: every matched previous order is truly at-or-before") {
    val rows = rowsOf(Relational.queries("join_asof")(spark, dir))
    assert(rows.nonEmpty)
    rows.foreach { m =>
      assert(!ldt(m("prev_f_date")).isAfter(ldt(m("o_orderdate"))))
    }
  }

  test("as-of join picks the latest eligible row") {
    import spark.implicits._
    // spot-check one customer end-to-end
    val rows = rowsOf(Relational.queries("join_asof")(spark, dir))
    val sample = rows.head
    val ck = sample("o_custkey").asInstanceOf[Long]
    val od = ldt(sample("o_orderdate"))
    val best = Tables.orders(spark, dir)
      .filter($"o_orderstatus" === "F" && $"o_custkey" === ck &&
        $"o_orderdate" <= lit(java.sql.Timestamp.valueOf(od)))
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      .select($"o_orderdate").limit(1).collect()
    assert(ldt(best.head.get(0)) == ldt(sample("prev_f_date")))
  }

  test("interval join counts only the 90-day window") {
    import spark.implicits._
    val rows = rowsOf(Relational.queries("join_interval")(spark, dir))
    val withF = rows.filter(_("n_recent_f").asInstanceOf[Long] > 0)
    assert(withF.nonEmpty)
    // left join keeps orders with zero matches
    val o = Tables.orders(spark, dir).filter($"o_orderstatus" === "O").count()
    assert(rows.size.toLong == o)
  }

  test("top-3 per group is bounded and ordered") {
    val rows = rowsOf(Relational.queries("topk_per_group")(spark, dir))
    rows.groupBy(_("o_custkey")).foreach { case (_, grp) =>
      assert(grp.size <= 3)
      val sorted = grp.sortBy(_("rk").asInstanceOf[Int])
      val prices = sorted.map(_("o_totalprice").asInstanceOf[Double])
      assert(prices == prices.sorted.reverse)
    }
  }

  test("rollup adds subtotal and grand-total rows consistently") {
    val rows = rowsOf(Relational.queries("agg_rollup")(spark, dir))
    val grand = rows.filter(m => m("rf") == "ALL" && m("ls") == "ALL")
    assert(grand.size == 1)
    val leafSum = rows.filter(m => m("rf") != "ALL" && m("ls") != "ALL")
      .map(_("revenue").asInstanceOf[Double]).sum
    val grandRev = grand.head("revenue").asInstanceOf[Double]
    assert(math.abs(leafSum - grandRev) < 1e-6 * math.abs(grandRev))
  }

  test("q3 plan broadcasts the customer dim") {
    val plan = Relational.queries("q3_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("q1 plan is a partial-final hash aggregate with pushed filter") {
    val qe = Relational.queries("q1_pricing")(spark, dir).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    // the shipdate filter must reach the parquet scan
    assert(qe.executedPlan.toString.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$plan")
  }

  test("pivot: language columns partition every source's documents") {
    val rows = rowsOf(Relational.queries("pivot_source_lang")(spark, dir))
    val total = Tables.documents(spark, dir).count()
    val cells = rows.map(r => Relational.PivotLangs
      .map(l => r(l).asInstanceOf[Long]).sum).sum
    assert(cells === total, "pivot cells must partition the corpus")
    assert(rows.map(_("source")).distinct.size === rows.size)
  }

  test("set ops: inclusion-exclusion holds over the user sets") {
    import spark.implicits._
    val m = rowsOf(Relational.queries("set_ops")(spark, dir))
      .map(r => r("op") -> r("n_users").asInstanceOf[Long]).toMap
    val buy = Tables.events(spark, dir).filter($"event_type" === "purchase")
      .select($"user_id").distinct().count()
    val err = Tables.events(spark, dir).filter($"event_type" === "error")
      .select($"user_id").distinct().count()
    assert(m("union") === buy + err - m("intersect"))
    assert(m("except") === buy - m("intersect"))
    assert(m("intersect") <= math.min(buy, err))
  }

  test("cube supersets rollup with the cross-margin slices") {
    def keyed(name: String) =
      rowsOf(Relational.queries(name)(spark, dir)).map(r =>
        (r("rf"), r("ls")) -> (r("n_items").asInstanceOf[Long],
          r("revenue").asInstanceOf[Double])).toMap
    val cube = keyed("agg_cube")
    val roll = keyed("agg_rollup")
    roll.foreach { case (k, (n, rev)) =>
      val (cn, crev) = cube(k)
      assert(cn === n)
      // same cells via two independent aggregations: counts exact,
      // revenue within float-summation tolerance
      assert(math.abs(crev - rev) <= math.abs(rev) * 1e-9)
    }
    // the slices rollup cannot express: (ALL, linestatus)
    assert(cube.keys.exists { case (rf, ls) => rf == "ALL" && ls != "ALL" })
    assert(cube.size > roll.size)
  }

  test("bucketed join plans zero exchanges under the SortMergeJoin") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    val abt = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Relational.bucketedJoinDf(spark, dir)
      val plan = df.queryExecution.executedPlan
      val smj = plan.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, s"expected a sort-merge join:\n${plan.treeString}")
      // the join reads co-bucketed files: no shuffle below it
      val below = smj.head.collect { case s: ShuffleExchangeExec => s }
      assert(below.isEmpty,
        s"bucketed join must not shuffle its inputs:\n${plan.treeString}")
      // the whole plan keeps exactly one exchange — the 5-group agg
      val all = plan.collect { case s: ShuffleExchangeExec => s }
      assert(all.size === 1, s"one exchange expected:\n${plan.treeString}")
      // and the answer equals the unbucketed twin's
      val expected = rowsOf(
        graft.sources.Tables.orders(spark, dir)
          .join(graft.sources.Tables.lineitem(spark, dir),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items")))
        .map(r => r("o_orderpriority") -> r("n_items")).toMap
      rowsOf(df).foreach { r =>
        assert(r("n_items") === expected(r("priority")))
      }
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
    }
  }

  test("promo share: dim side broadcasts, ratios bracket, one year " +
    "cross-checked") {
    val df = Relational.queries("q14_promo_share")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"part must broadcast:\n$plan")
    val rows = rowsOf(df)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, t) = (r("promo_rev").asInstanceOf[Double],
        r("total_rev").asInstanceOf[Double])
      assert(p >= 0.0 && p <= t)
      val s = r("promo_share").asInstanceOf[Double]
      assert(s >= 0.0 && s <= 1.0)
      assert(math.abs(s - p / t) < 1e-6)
    }
    // direct cross-check of one year's totals
    val yr = rows.head("yr").asInstanceOf[Long]
    val direct = rowsOf(Tables.lineitem(spark, dir)
      .filter(year(col("l_shipdate")) === yr)
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("t"))).head("t").asInstanceOf[Double]
    assert(math.abs(
      rows.head("total_rev").asInstanceOf[Double] - direct) < 1e-6 * direct)
  }

  test("funnel attrition is monotone and retention cohorts are complete") {
    val f = rowsOf(graft.operators.Keyed.queries("events_funnel")(spark, dir))
      .sortBy(_("step").asInstanceOf[Long])
    assert(f.map(_("event_type")) ===
      graft.operators.Keyed.FunnelSteps)
    // step-to-step survivor counts never grow; step 1 converts 100%
    val ns = f.map(_("n_users").asInstanceOf[Long])
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a })
    assert(f.head("conv_pct") === 100L)
    f.foreach(r => assert(r("conv_pct").asInstanceOf[Long] ===
      r("n_users").asInstanceOf[Long] * 100 / ns.head))

    val rws = rowsOf(
      graft.operators.Keyed.queries("events_retention")(spark, dir))
    // age-0 cells retain the whole cohort by construction
    rws.filter(_("age") == 0L).foreach { r =>
      assert(r("n_active") === r("n_cohort"))
      assert(r("retained_pct") === 100L)
    }
    rws.foreach { r =>
      assert(r("age").asInstanceOf[Long] >= 0L)
      assert(r("n_active").asInstanceOf[Long] <=
        r("n_cohort").asInstanceOf[Long])
    }
    // cohort sizes partition the user population
    val users = rowsOf(Tables.events(spark, dir)
      .select(countDistinct(col("user_id")).as("n"))).head("n")
    assert(rws.filter(_("age") == 0L)
      .map(_("n_cohort").asInstanceOf[Long]).sum === users)
  }

  test("kaplan-meier survival matches the hand computation with censoring") {
    // day d -> hour d*24; one event per (user, active-day endpoint)
    def ev(id: Long, uid: Long, day: Long) =
      (id, day * 24L * 3600L * 1000000000L, uid, "view", 1.0)
    val sdir = writeEventsFixture(Seq(
      ev(1, 1, 0),               // u1: duration 0, died
      ev(2, 2, 0), ev(3, 2, 2),  // u2: duration 2, died
      ev(4, 3, 0), ev(5, 3, 2),  // u3: duration 2, died
      ev(6, 4, 5), ev(7, 4, 25), // u4: duration 20, censored (25 >= 30-7)
      ev(8, 5, 0), ev(9, 5, 10), // u5: duration 10, died
      ev(10, 9, 0), ev(11, 9, 30))) // u9: duration 30, censored anchor
    val rs = rowsOf(graft.operators.Keyed.queries("events_survival")(spark, sdir))
      .map(r => r("duration_days").asInstanceOf[Long] -> r).toMap
    assert(rs.keySet == Set(0L, 2L, 10L, 20L, 30L))
    assert(rs(0L)("n_risk") == 6L && rs(0L)("deaths") == 1L)
    assert(rs(2L)("n_risk") == 5L && rs(2L)("deaths") == 2L)
    assert(rs(10L)("n_risk") == 3L && rs(10L)("deaths") == 1L)
    assert(rs(20L)("censored") == 1L && rs(20L)("deaths") == 0L)
    assert(rs(30L)("censored") == 1L)
    def s(d: Long) = rs(d)("survival").asInstanceOf[Double]
    assert(math.abs(s(0) - 5.0 / 6.0) < 1e-6)
    assert(math.abs(s(2) - 0.5) < 1e-6)       // 5/6 * 3/5
    assert(math.abs(s(10) - 1.0 / 3.0) < 1e-6) // 1/2 * 2/3
    assert(s(20) == s(10) && s(30) == s(10))   // censoring-only steps are flat
  }

  test("survival on the corpus is a proper non-increasing curve from n users") {
    val rs = rowsOf(graft.operators.Keyed.queries("events_survival")(spark, dir))
      .sortBy(_("duration_days").asInstanceOf[Long])
    assert(rs.nonEmpty)
    val users = rowsOf(Tables.events(spark, dir)
      .select(countDistinct(col("user_id")).as("n"))).head("n")
    assert(rs.head("n_risk") == users)
    val sv = rs.map(_("survival").asInstanceOf[Double])
    sv.foreach(v => assert(v >= 0.0 && v <= 1.0))
    sv.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-12) }
    // the risk set shrinks by exactly the timeline's own counts
    val exits = rs.map(r => r("deaths").asInstanceOf[Long] +
      r("censored").asInstanceOf[Long])
    assert(exits.sum == users)
  }

  test("difference-in-differences matches the hand computation") {
    def ev(id: Long, uid: Long, day: Long, t: String) =
      (id, day * 24L * 3600L * 1000000000L, uid, t, 1.0)
    // mid = (0+9+1)/2 = 5; odd users treat, even control
    val fixture =
      Seq((1L, Seq(0L), Seq(5L, 6L, 7L, 8L)),   // treat: d = 3
        (3L, Seq(0L, 1L), Seq(5L, 6L, 7L)),      // treat: d = 1
        (2L, Seq(1L), Seq(6L, 7L)),              // ctrl:  d = 1
        (4L, Seq(0L, 2L), Seq(5L, 8L)))          // ctrl:  d = 0
    var id = 0L
    val rows = fixture.flatMap { case (u, pre, post) =>
      (pre ++ post).map { d => id += 1; ev(id, u, d, "purchase") }
    } :+ ev(999L, 4L, 9L, "view") // stretch the corpus to day 9
    val ddir = writeEventsFixture(rows)
    val r = rowsOf(graft.operators.Keyed.queries("events_did")(spark, ddir)).head
    assert(r("n_treat") == 2L && r("n_ctrl") == 2L)
    assert(r("mean_diff_treat") == 2.0 && r("mean_diff_ctrl") == 0.5)
    assert(r("did") == 1.5)
    val se = r("se").asInstanceOf[Double]
    assert(math.abs(se - math.sqrt(0.625)) < 1e-12)
    assert(math.abs(r("t_stat").asInstanceOf[Double] - 1.5 / math.sqrt(0.625)) < 1e-12)
  }

  test("streak census: gaps-and-islands max runs, users partitioned") {
    def ev(id: Long, uid: Long, day: Long) =
      (id, day * 24L * 3600L * 1000000000L, uid, "view", 1.0)
    val sdir = writeEventsFixture(Seq(
      ev(1, 1, 0), ev(2, 1, 1), ev(3, 1, 2), ev(4, 1, 5), ev(5, 1, 6),
      ev(6, 2, 0), ev(7, 2, 2), ev(8, 2, 4)))
    val census = rowsOf(graft.operators.Keyed.queries("events_streaks")(spark, sdir))
      .map(r => r("max_streak") -> r("n_users")).toMap
    assert(census == Map(3L -> 1L, 1L -> 1L))
    // corpus: census covers every user exactly once, streaks positive
    val rs = rowsOf(graft.operators.Keyed.queries("events_streaks")(spark, dir))
    val users = rowsOf(Tables.events(spark, dir)
      .select(countDistinct(col("user_id")).as("n"))).head("n")
    assert(rs.map(_("n_users").asInstanceOf[Long]).sum == users)
    rs.foreach(r => assert(r("max_streak").asInstanceOf[Long] >= 1L))
  }

  test("lorenz curve and gini match the hand computation") {
    def ev(id: Long, uid: Long) = (id, id * 1000000000L, uid, "view", 1.0)
    // per-user event counts 1, 1, 2, 4 -> classical Gini = 0.3125
    val ldir = writeEventsFixture(Seq(
      ev(1, 1), ev(2, 2), ev(3, 3), ev(4, 3),
      ev(5, 4), ev(6, 4), ev(7, 4), ev(8, 4)))
    val rs = rowsOf(graft.operators.Keyed.queries("events_lorenz")(spark, ldir))
      .sortBy(_("n_events").asInstanceOf[Long])
    assert(rs.map(r => (r("n_events"), r("n_users"))) ==
      Seq((1L, 2L), (2L, 1L), (4L, 1L)))
    assert(rs.map(_("cum_users_permille")) == Seq(500L, 750L, 1000L))
    assert(rs.map(_("cum_value_permille")) == Seq(250L, 500L, 1000L))
    rs.foreach(r => assert(r("gini") == 0.3125))

    // corpus: a proper Lorenz curve — monotone, under the diagonal,
    // ending at (1000, 1000), with gini in [0, 1)
    val cs = rowsOf(graft.operators.Keyed.queries("events_lorenz")(spark, dir))
      .sortBy(_("n_events").asInstanceOf[Long])
    assert(cs.nonEmpty)
    assert(cs.last("cum_users_permille") == 1000L)
    assert(cs.last("cum_value_permille") == 1000L)
    cs.foreach { r =>
      assert(r("cum_value_permille").asInstanceOf[Long] <=
        r("cum_users_permille").asInstanceOf[Long])
      val g = r("gini").asInstanceOf[Double]
      assert(g >= 0.0 && g < 1.0)
    }
  }

  test("cohort LTV curve matches the hand computation and accumulates monotonically") {
    import spark.implicits._
    val odir = java.nio.file.Files.createTempDirectory("graft_fix").toString
    def d(s: String) = java.sql.Date.valueOf(s)
    Seq(
      (1L, d("2020-01-05"), 10.00), (1L, d("2020-02-01"), 20.00),
      (1L, d("2020-02-20"), 5.00), (2L, d("2020-01-30"), 7.00),
      (3L, d("2020-03-02"), 1.00), (3L, d("2020-05-09"), 2.00))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$odir/orders.parquet")
    val rs = rowsOf(graft.operators.Keyed.queries("orders_cohort_ltv")(spark, odir))
      .map(r => (r("cohort_m").asInstanceOf[Long], r("age").asInstanceOf[Long]) -> r)
      .toMap
    val jan = 2020L * 12 // 2020-01 month index
    assert(rs((jan, 0L))("n_active") == 2L)
    assert(rs((jan, 0L))("rev_cents") == 1700L)
    assert(rs((jan, 1L))("cum_rev_cents") == 4200L)
    val mar = jan + 2
    assert(rs((mar, 0L))("cum_rev_cents") == 100L)
    assert(rs((mar, 2L))("cum_rev_cents") == 300L)
    assert(!rs.contains((mar, 1L)), "no order in the cohort's silent month")

    // corpus: cumulative revenue never decreases within a cohort, and
    // age-0 cohort sizes partition the customer base
    val cs = rowsOf(graft.operators.Keyed.queries("orders_cohort_ltv")(spark, dir))
    cs.groupBy(_("cohort_m")).foreach { case (_, rows) =>
      val byAge = rows.sortBy(_("age").asInstanceOf[Long])
        .map(_("cum_rev_cents").asInstanceOf[Long])
      byAge.sliding(2).foreach { case Seq(a, b) => assert(b >= a) }
    }
    val custs = rowsOf(Tables.orders(spark, dir)
      .select(countDistinct(col("o_custkey")).as("n"))).head("n")
    assert(cs.filter(_("age") == 0L)
      .map(_("n_active").asInstanceOf[Long]).sum == custs)
  }

  test("grouping sets carry only the two margins, matching cube's") {
    def keyed(name: String) =
      rowsOf(Relational.queries(name)(spark, dir)).map(r =>
        (r("rf"), r("ls")) -> (r("n_items").asInstanceOf[Long],
          r("revenue").asInstanceOf[Double])).toMap
    val gs = keyed("agg_grouping_sets")
    val cube = keyed("agg_cube")
    // only margin cells: exactly one side is ALL in every row
    gs.keys.foreach { case (rf, ls) =>
      assert((rf == "ALL") != (ls == "ALL"),
        s"($rf, $ls) is not a one-dimension margin")
    }
    // every margin equals cube's same cell (two independent plans)
    gs.foreach { case (k, (n, rev)) =>
      val (cn, crev) = cube(k)
      assert(cn === n)
      assert(math.abs(crev - rev) <= math.abs(rev) * 1e-9)
    }
    // and the margins are complete: same count as cube's margin cells
    assert(gs.size === cube.keys.count { case (rf, ls) =>
      (rf == "ALL") != (ls == "ALL") })
  }

  test("rfm: quintiles balance within each segment, ranks align with " +
    "raw metrics") {
    val rows = rowsOf(Relational.queries("customer_rfm")(spark, dir))
    assert(rows.nonEmpty)
    rows.groupBy(_("c_mktsegment")).values.foreach { seg =>
      val n = seg.size
      // ntile balance: bucket sizes differ by at most one
      Seq("r_tile", "f_tile", "m_tile").foreach { t =>
        val sizes = seg.groupBy(_(t)).values.map(_.size)
        assert(sizes.max - sizes.min <= 1, s"$t unbalanced: $sizes")
        assert(seg.forall(r => (1L to 5L).contains(r(t).asInstanceOf[Long])))
      }
      // tile 1 of monetary holds the segment's richest customer
      val best = seg.maxBy(r => (r("monetary").asInstanceOf[Double],
        -r("c_custkey").asInstanceOf[Long]))
      assert(best("m_tile") === 1L)
      // recency tile 1 contains the most recent buyer (recency 0 exists
      // only for whoever placed the corpus's last order's segment)
      val mostRecent = seg.minBy(r => (r("recency_days").asInstanceOf[Long],
        r("c_custkey").asInstanceOf[Long]))
      assert(mostRecent("r_tile") === 1L)
      assert(n === seg.map(_("c_custkey")).distinct.size)
    }
  }

  test("big orders: top-k plans TakeOrdered, every row passes the " +
    "HAVING bound") {
    val df = Relational.queries("q18_big_orders")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$plan")
    val rows = rowsOf(df)
    assert(rows.size <= 20 && rows.nonEmpty)
    val qs = rows.map(_("sum_qty").asInstanceOf[Double])
    assert(qs.forall(_ > 150.0))
    assert(qs.zip(qs.tail).forall { case (a, b) => a >= b }, "desc order")
    // cross-check one order's aggregate
    val k = rows.head("o_orderkey").asInstanceOf[Long]
    val direct = rowsOf(Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") === k)
      .agg(sum(col("l_quantity")).as("s"))).head("s")
    assert(direct === rows.head("sum_qty"))
  }

  test("funnel window dial: monotone in both grid directions, shipped " +
    "column equals events_funnel") {
    val K = graft.operators.Keyed
    val rows = rowsOf(K.queries("events_funnel_curve")(spark, dir))
    val grid = rows.map(r => (r("window_us").asInstanceOf[Long],
      r("step").asInstanceOf[Long]) -> r("n_users").asInstanceOf[Long]).toMap
    assert(grid.size === K.FunnelCurveWindows.size * K.FunnelSteps.size)
    // down a column: attrition (counts never grow with the step)
    K.FunnelCurveWindows.foreach { w =>
      (1 until K.FunnelSteps.size).foreach { s =>
        assert(grid((w, s + 1L)) <= grid((w, s.toLong)))
      }
    }
    // across a row: patience (a wider window only admits more)
    K.FunnelCurveWindows.zip(K.FunnelCurveWindows.tail).foreach {
      case (w1, w2) => (1 to K.FunnelSteps.size).foreach { s =>
        assert(grid((w1, s.toLong)) <= grid((w2, s.toLong)))
      }
    }
    // the shipped 24 h column IS events_funnel
    val shipped = rowsOf(K.queries("events_funnel")(spark, dir))
      .map(r => r("step").asInstanceOf[Long] ->
        r("n_users").asInstanceOf[Long]).toMap
    shipped.foreach { case (s, n) =>
      assert(grid((K.FunnelWindowUs, s)) === n)
    }
  }

  test("supplier hhi: shares sum to one, index sits in the n-supplier " +
    "bounds") {
    val rows = rowsOf(Relational.queries("supplier_hhi")(spark, dir))
    assert(rows.nonEmpty)
    val n = rows.head("n_suppliers").asInstanceOf[Long]
    assert(rows.size.toLong === n)
    assert(rows.map(_("suppkey")).distinct.size === rows.size)
    val shareSum = rows.map(_("share").asInstanceOf[Double]).sum
    assert(math.abs(shareSum - 1.0) < 1e-3)
    val hhi = rows.head("hhi").asInstanceOf[Double]
    // HHI of n participants lies in [1/n (perfectly even), 1 (monopoly)]
    assert(hhi >= 1.0 / n - 1e-9 && hhi <= 1.0 + 1e-9)
    // recompute from the published shares
    val direct = rows.map(r => math.pow(r("share").asInstanceOf[Double], 2)).sum
    assert(math.abs(hhi - direct) < 1e-4)
  }

  test("monthly trend: lag-12 aligns calendar months, growth floors " +
    "the cents-exact ratio") {
    val rows = rowsOf(Relational.queries("orders_monthly")(spark, dir))
      .sortBy(_("ym").asInstanceOf[Long])
    assert(rows.nonEmpty)
    val byYm = rows.map(r => r("ym").asInstanceOf[Long] -> r).toMap
    rows.foreach { r =>
      val ym = r("ym").asInstanceOf[Long]
      val prevYm = ym - 100 // same month, previous year
      (Option(r("revenue_prev_year")), byYm.get(prevYm)) match {
        case (Some(p), Some(prev)) =>
          assert(p === prev("revenue"), s"lag-12 misaligned at $ym")
          val expect = math.floor(
            (r("revenue").asInstanceOf[Double] - p.asInstanceOf[Double]) *
              10000.0 / p.asInstanceOf[Double]).toLong
          assert(r("yoy_bp") === expect)
        case (None, None) => assert(r("yoy_bp") == null)
        case (got, want) =>
          // lag(12) counts ROWS: with a complete month grid these match;
          // a gap month would break row-lag alignment — assert the grid
          // is complete so the semantic is honest
          fail(s"month grid gap at $ym: lag saw $got, calendar says $want")
      }
    }
    // the series covers a contiguous month grid
    val yms = rows.map(_("ym").asInstanceOf[Long])
    yms.zip(yms.tail).foreach { case (a, b) =>
      assert(b == a + 1 || (b == a + 89 && a % 100 == 12),
        s"month gap between $a and $b")
    }
  }

  test("dau/wau: weekly actives bound daily, stickiness floors exactly") {
    val rows = rowsOf(graft.operators.Keyed.queries("events_dau_wau")(spark, dir))
    assert(rows.nonEmpty)
    val byDay = rows.map(r => r("day").asInstanceOf[Long] -> r).toMap
    rows.foreach { r =>
      val (dau, wau) = (r("dau").asInstanceOf[Long], r("wau").asInstanceOf[Long])
      assert(dau >= 1L && wau >= dau,
        "a day's actives are inside its trailing week")
      assert(r("stickiness_pct").asInstanceOf[Long] === dau * 100 / wau)
    }
    // cross-check one day's WAU with a direct distinct count
    val d0 = byDay.keys.max
    val direct = rowsOf(Tables.events(spark, dir)
      .select(col("user_id"),
        expr(s"ts_us div ${graft.operators.Keyed.DayUs}").as("day"))
      .filter(col("day") >= d0 - 6 && col("day") <= d0)
      .agg(countDistinct(col("user_id")).as("n"))).head("n")
    assert(byDay(d0)("wau") === direct)
  }

  test("markov transitions: cells partition the step stream, row " +
    "percents floor exactly") {
    val rows = rowsOf(graft.operators.Keyed.queries("events_markov")(spark, dir))
    // 5 event types: the matrix has at most 25 cells and the step count
    // is events minus one per user
    assert(rows.size <= 25)
    val ev = rowsOf(Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n")))
    val steps = ev.map(_("n").asInstanceOf[Long] - 1).sum
    assert(rows.map(_("n_steps").asInstanceOf[Long]).sum === steps)
    rows.groupBy(_("prev")).values.foreach { row =>
      val tot = row.map(_("n_steps").asInstanceOf[Long]).sum
      row.foreach { c =>
        assert(c("row_pct").asInstanceOf[Long] ===
          c("n_steps").asInstanceOf[Long] * 100 / tot)
      }
      assert(row.map(_("row_pct").asInstanceOf[Long]).sum <= 100L)
    }
  }

  test("events_paths: 3-step walks partition the walk stream, shares " +
    "floor exactly; fixture walks enumerate by hand") {
    val rows = rowsOf(graft.operators.Keyed.queries("events_paths")(spark, dir))
    // 5 event types: at most 125 path cells; each user with n events
    // contributes max(n - 2, 0) walks
    assert(rows.size <= 125)
    val ev = rowsOf(Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n")))
    val walks = ev.map(m => math.max(m("n").asInstanceOf[Long] - 2, 0L)).sum
    val tot = rows.map(_("n_walks").asInstanceOf[Long]).sum
    assert(tot === walks)
    rows.foreach { c =>
      assert(c("share_bps").asInstanceOf[Long] ===
        c("n_walks").asInstanceOf[Long] * 10000 / tot)
    }
    assert(rows.map(_("share_bps").asInstanceOf[Long]).sum <= 10000L)
    // hand fixture: user 1 walks (click,view,purchase),(view,purchase,error);
    // user 2 is two events short of a walk
    val fixDir = writeEventsFixture(Seq(
      (1L, 1000L, 1L, "click", 1.0),
      (2L, 2000L, 1L, "view", 1.0),
      (3L, 3000L, 1L, "purchase", 1.0),
      (4L, 4000L, 1L, "error", 1.0),
      (5L, 1000L, 2L, "click", 1.0),
      (6L, 2000L, 2L, "view", 1.0)))
    val fx = rowsOf(graft.operators.Keyed.queries("events_paths")(spark, fixDir))
      .map(m => (m("s1"), m("s2"), m("s3")) -> m).toMap
    assert(fx.size == 2)
    assert(fx(("click", "view", "purchase"))("n_walks") == 1L)
    assert(fx(("view", "purchase", "error"))("n_walks") == 1L)
    assert(fx.values.forall(_("share_bps") == 5000L))
  }

  test("events_ab_test: counts, z and the activation window match the hand computation") {
    val day = 86400000000L * 1000L // ns per day
    // variant 0 = users 2,4; variant 1 = users 1,3. User 2 activates;
    // user 4's only purchase is on day 9 — outside the 7-day window.
    val fixDir = writeEventsFixture(Seq(
      (1L, 1L * day, 2L, "purchase", 1.0),
      (2L, 1L * day, 4L, "view", 1.0),
      (3L, 9L * day, 4L, "purchase", 1.0),
      (4L, 1L * day, 1L, "purchase", 1.0),
      (5L, 1L * day, 3L, "purchase", 1.0)))
    val m = rowsOf(graft.operators.Keyed.queries("events_ab_test")(spark, fixDir)).head
    assert(m("n_a") == 2L && m("c_a") == 1L)
    assert(m("n_b") == 2L && m("c_b") == 2L)
    assert(m("rate_a") == 0.5 && m("rate_b") == 1.0)
    assert(m("lift_bps") == 5000L)
    // z = 0.5 / sqrt(0.75 * 0.25 * (1/2 + 1/2)) = 1.1547...
    val z = m("z").asInstanceOf[Double]
    assert(math.abs(z - 0.5 / math.sqrt(0.1875)) < 1e-12)
    val p = m("p_value").asInstanceOf[Double]
    assert(p > 0.2 && p < 0.3 && m("significant") == false)
    // real data: the verdict composes from its own columns
    val r = rowsOf(graft.operators.Keyed.queries("events_ab_test")(
      spark, sfDir())).head
    assert(r("n_a").asInstanceOf[Long] > 0 && r("n_b").asInstanceOf[Long] > 0)
    if (r("p_value") != null)
      assert(r("significant") == (r("p_value").asInstanceOf[Double] < 0.05))
  }

  test("events_cuped: theta and variances match an independent recompute; adjustment never hurts") {
    val dir0 = sfDir()
    val m = rowsOf(graft.operators.Keyed.queries("events_cuped")(spark, dir0)).head
    // independent fold: per-user (pre, post) cents from the raw events
    val days = rowsOf(Tables.events(spark, dir0)
      .selectExpr("user_id", s"ts_us div ${graft.operators.Keyed.DayUs} as day",
        "cast(round(value * 100) as long) as cents"))
    val lo = days.map(_("day").asInstanceOf[Long]).min
    val hi = days.map(_("day").asInstanceOf[Long]).max
    val mid = (lo + hi + 1) / 2
    val per = days.groupBy(_("user_id")).values.map { es =>
      val x = es.filter(_("day").asInstanceOf[Long] < mid)
        .map(_("cents").asInstanceOf[Long]).sum
      val y = es.filter(_("day").asInstanceOf[Long] >= mid)
        .map(_("cents").asInstanceOf[Long]).sum
      (x, y)
    }.toSeq
    val n = per.size.toLong
    val sx = per.map(_._1).sum; val sy = per.map(_._2).sum
    val sxx = per.map(t => t._1 * t._1).sum
    val syy = per.map(t => t._2 * t._2).sum
    val sxy = per.map(t => t._1 * t._2).sum
    val covN2 = n.toDouble * sxy - sx.toDouble * sy
    val varxN2 = n.toDouble * sxx - sx.toDouble * sx
    val varyN2 = n.toDouble * syy - sy.toDouble * sy
    assert(m("n") == n)
    assert(m("theta") == covN2 / varxN2)
    assert(m("var_y") == varyN2 / (n.toDouble * n.toDouble))
    assert(m("var_adj") ==
      (varyN2 - covN2 * covN2 / varxN2) / (n.toDouble * n.toDouble))
    // the closed form guarantees var_adj <= var_y, so the reduction is
    // a true percentage of variance removed
    val (vy, va) = (m("var_y").asInstanceOf[Double],
      m("var_adj").asInstanceOf[Double])
    assert(va >= 0.0 && va <= vy)
    val red = m("reduction_bps").asInstanceOf[Long]
    assert(red >= 0L && red <= 10000L)
    assert(red == math.floor((1.0 - va / vy) * 10000.0).toLong)
  }

  test("window ranks: quartiles balance within one row, rank stats " +
    "bound correctly per key") {
    val rows = rowsOf(graft.operators.Keyed.queries("window_ranks")(spark, dir))
    rows.groupBy(_("event_type")).values.foreach { grp =>
      val tiles = grp.groupBy(_("tile").asInstanceOf[Long])
        .view.mapValues(_.size).toMap
      assert(tiles.keySet === Set(1L, 2L, 3L, 4L))
      assert(tiles.values.max - tiles.values.min <= 1,
        "ntile must balance quartiles within one row")
      val prs = grp.map(_("pr").asInstanceOf[Double])
      val cds = grp.map(_("cd").asInstanceOf[Double])
      assert(prs.min === 0.0 && prs.max === 1.0)
      assert(cds.max === 1.0 && cds.min > 0.0)
    }
  }

  test("schema evolution: mergeSchema unions parquet generations, " +
    "old files read null for new columns") {
    import spark.implicits._
    val dir2 = java.nio.file.Files.createTempDirectory("graft_evo").toString
    // generation 1: (doc_id, text); generation 2 adds a quality column
    Seq((1L, "old row")).toDF("doc_id", "text")
      .write.parquet(s"$dir2/docs/g=1")
    Seq((2L, "new row", 0.9)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$dir2/docs/g=2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir2/docs")
    assert(merged.columns.toSet === Set("doc_id", "text", "quality", "g"))
    val byId = rowsOf(merged).map(r =>
      r("doc_id").asInstanceOf[Long] -> r).toMap
    assert(byId(1L)("quality") == null) // old generation: padded null
    assert(byId(2L)("quality") == 0.9)
    // and WITHOUT mergeSchema the read keeps one generation's schema —
    // the default a reader must not rely on across schema drift
    val plain = spark.read.parquet(s"$dir2/docs")
    assert(plain.columns.toSet.subsetOf(
      Set("doc_id", "text", "quality", "g")))
    graft.functions.Fs.deleteRecursively(new java.io.File(dir2))
  }

  test("join_asof_tol: left-complete, stale matches nulled, fresh matches agree with join_asof") {
    import spark.implicits._
    val asof = SparkEntry.queries("join_asof")(spark, dir)
    val tol = SparkEntry.queries("join_asof_tol")(spark, dir).cache()
    // LEFT semantics: every open order survives, matched or not
    val nOpen = graft.sources.Tables.orders(spark, dir)
      .filter($"o_orderstatus" === "O").count()
    assert(tol.count() === nOpen)
    // unmatched rows expose nothing
    assert(tol.filter(!$"matched")
      .filter($"prev_f_date".isNotNull || $"prev_f_price".isNotNull)
      .count() === 0L)
    // a matched row IS the plain as-of row (the tolerance only removes);
    // and every plain as-of match within tolerance survives here
    val joined = tol.filter($"matched").as("t")
      .join(asof.as("a"), Seq("o_orderkey"))
    assert(joined.filter($"t.prev_f_date" =!= $"a.prev_f_date" ||
      $"t.prev_f_price" =!= $"a.prev_f_price").count() === 0L)
    val freshPlain = asof
      .filter(datediff($"o_orderdate", $"prev_f_date") <=
        graft.operators.Relational.AsofTolDays).count()
    assert(tol.filter($"matched").count() === freshPlain)
    assert(tol.filter(!$"matched").count() > 0L,
      "fixture should contain stale/absent matches")
    tol.unpersist()
  }

  test("orders_cohort: anchor month holds the full cohort, retention never exceeds it") {
    import spark.implicits._
    val rows = rowsOf(Relational.queries("orders_cohort")(spark, dir))
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_("cohort_ym").asInstanceOf[Long])
    byCohort.foreach { case (_, rs) =>
      val k0 = rs.find(_("k") == 0L)
      assert(k0.nonEmpty, "every cohort orders in its anchor month by definition")
      val base = k0.get("n_customers").asInstanceOf[Long]
      rs.foreach { m =>
        assert(m("k").asInstanceOf[Long] >= 0L)
        assert(m("n_customers").asInstanceOf[Long] <= base,
          s"retention cannot exceed cohort size: $m")
      }
    }
    // cohort anchors partition the customers: k=0 counts sum to the
    // number of distinct ordering customers
    val total = Tables.orders(spark, dir).select($"o_custkey").distinct().count()
    assert(rows.filter(_("k") == 0L)
      .map(_("n_customers").asInstanceOf[Long]).sum == total)
  }

  test("events_scd_ranges: versions contiguous, intervals abut, census closes") {
    import spark.implicits._
    val rows = rowsOf(graft.operators.Keyed.queries("events_scd_ranges")(spark, dir))
    assert(rows.nonEmpty)
    val perUser = rows.groupBy(_("user_id").asInstanceOf[Long])
    val evCounts = rowsOf(Tables.events(spark, dir)
      .groupBy($"user_id").agg(count(lit(1)).as("n")))
      .map(m => m("user_id").asInstanceOf[Long] -> m("n").asInstanceOf[Long])
      .toMap
    perUser.foreach { case (uid, rs) =>
      val ranked = rs.sortBy(_("version").asInstanceOf[Long])
      // versions are 1..K with no gaps
      assert(ranked.map(_("version")) == (1L to ranked.size).toList)
      // consecutive intervals abut: valid_to(v) == valid_from(v+1);
      // consecutive states DIFFER (else they'd be one version)
      ranked.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a("valid_to_us") == b("valid_from_us"))
          assert(a("state") != b("state"))
        case _ =>
      }
      // exactly the last version is current (open-ended)
      assert(ranked.init.forall(_("is_current") == false) &&
        ranked.last("is_current") == true &&
        ranked.last("valid_to_us") == null)
      // the interval census closes: every event of the user is in
      // exactly one version
      assert(ranked.map(_("n_events").asInstanceOf[Long]).sum == evCounts(uid))
    }
  }

  test("q15_top_supplier: argmax set equals an independent per-supplier recompute") {
    import spark.implicits._
    val top = rowsOf(Relational.queries("q15_top_supplier")(spark, dir))
    assert(top.nonEmpty)
    // independent recompute: per-supplier cents revenue over the window,
    // per-row round-then-integer-sum (the q6/q7/q8/q11 canon the query
    // itself uses — order-independent, so the argmax set is exact)
    val rev = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum(round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
        .cast("long")).as("rc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mx = rev.values.max
    val expect = rev.filter(_._2 == mx).keySet
    assert(top.map(_("suppkey").asInstanceOf[Long]).toSet == expect)
    top.foreach { m =>
      assert(math.round(m("total_revenue").asInstanceOf[Double] * 100) == mx)
    }
  }

  test("q21_sole_late: decorrelated plan equals Spark SQL's own correlated EXISTS form") {
    // the textbook double-correlated EXISTS/NOT-EXISTS, planned by
    // Catalyst's own subquery decorrelation — cross-checks our manual
    // two-aggregation formulation through a THIRD engine path (DuckDB
    // being the second)
    Tables.lineitem(spark, dir).createOrReplaceTempView("v_lineitem")
    Tables.orders(spark, dir).createOrReplaceTempView("v_orders")
    Tables.supplier(spark, dir).createOrReplaceTempView("v_supplier")
    val sqlForm = spark.sql(
      s"""SELECT s_name, count(*) AS numwait
         |FROM v_supplier
         |JOIN v_lineitem l1 ON l1.l_suppkey = s_suppkey
         |JOIN v_orders ON o_orderkey = l1.l_orderkey
         |WHERE o_orderstatus = 'F'
         |  AND l1.l_shipdate > o_orderdate + INTERVAL ${Relational.LateDays} DAY
         |  AND EXISTS (
         |    SELECT 1 FROM v_lineitem l2
         |    WHERE l2.l_orderkey = l1.l_orderkey
         |      AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (
         |    SELECT 1 FROM v_lineitem l3
         |    WHERE l3.l_orderkey = l1.l_orderkey
         |      AND l3.l_suppkey <> l1.l_suppkey
         |      AND l3.l_shipdate > o_orderdate + INTERVAL ${Relational.LateDays} DAY)
         |GROUP BY 1
         |ORDER BY numwait DESC, s_name
         |LIMIT 20""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val ours = rowsOf(Relational.queries("q21_sole_late")(spark, dir))
      .map(m => (m("s_name").asInstanceOf[String],
        m("numwait").asInstanceOf[Long]))
    assert(ours.nonEmpty)
    assert(ours.toSet == sqlForm.toSet)
  }

  test("q22_idle_capital: integer threshold matches the textbook scalar-subquery form") {
    Tables.customer(spark, dir).createOrReplaceTempView("v_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("v_orders")
    Tables.nation(spark, dir).createOrReplaceTempView("v_nation")
    val sqlForm = spark.sql(
      """SELECT n_name, count(*) AS n_custs,
        |  round(sum(c_acctbal), 2) AS total_acctbal
        |FROM v_customer JOIN v_nation ON n_nationkey = c_nationkey
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM v_customer
        |                   WHERE c_acctbal > 0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM v_orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val ours = rowsOf(Relational.queries("q22_idle_capital")(spark, dir))
      .map(m => (m("n_name").asInstanceOf[String],
        m("n_custs").asInstanceOf[Long])).toMap
    assert(ours.nonEmpty)
    // the double-avg textbook threshold and our integer cross-multiplied
    // threshold agree unless a balance lands within an ulp of the
    // average — impossible for this fixture's cent-grained balances
    assert(ours == sqlForm)
  }

  test("basket_pairs: support recomputes exactly; lift consistent with the margins") {
    import spark.implicits._
    val rows = rowsOf(Relational.queries("basket_pairs")(spark, dir))
    assert(rows.nonEmpty && rows.size <= 50)
    // ordered by support desc
    val sups = rows.map(_("support").asInstanceOf[Long])
    assert(sups == sups.sorted.reverse)
    val items = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
    val nOrders = items.select($"l_orderkey").distinct().count()
    val cnts = items.groupBy($"l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent recompute of the top pair's support via two semi-joins
    val top = rows.head
    val (pa, pb) = (top("part_a").asInstanceOf[Long],
      top("part_b").asInstanceOf[Long])
    val withA = items.filter($"l_partkey" === pa).select($"l_orderkey")
    val withB = items.filter($"l_partkey" === pb).select($"l_orderkey")
    assert(withA.join(withB, Seq("l_orderkey")).count() ==
      top("support").asInstanceOf[Long])
    rows.foreach { m =>
      val (s, ca, cb) = (m("support").asInstanceOf[Long],
        m("cnt_a").asInstanceOf[Long], m("cnt_b").asInstanceOf[Long])
      assert(s >= Relational.BasketMinSupport && s <= math.min(ca, cb))
      assert(ca == cnts(m("part_a").asInstanceOf[Long]))
      assert(cb == cnts(m("part_b").asInstanceOf[Long]))
      val lift = BigDecimal(s.toDouble * nOrders / (ca.toDouble * cb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(m("lift") == lift)
    }
  }

  test("window_dist: quartiles balanced, pct_rank/cume exact and monotone per nation") {
    val rows = rowsOf(Relational.queries("window_dist")(spark, dir))
    assert(rows.nonEmpty)
    rows.groupBy(_("c_nationkey")).foreach { case (_, grp) =>
      val n = grp.size
      // ntile: bucket sizes differ by at most 1 and are ordered
      val sizes = grp.groupBy(_("quartile").asInstanceOf[Int])
        .view.mapValues(_.size).toMap
      assert(sizes.keySet.subsetOf(Set(1, 2, 3, 4)))
      if (n >= 4) {
        assert(sizes.values.max - sizes.values.min <= 1)
        // earlier buckets are never smaller than later ones
        val ordered = (1 to 4).map(sizes(_))
        assert(ordered == ordered.sortBy(-_))
      }
      // with the unique (acctbal DESC, custkey) order, rank == row
      // number, so pct_rank = (rn-1)/(n-1) and cume = rn/n exactly
      val sorted = grp.sortBy(m => (-m("c_acctbal").asInstanceOf[Double],
        m("c_custkey").asInstanceOf[Long]))
      sorted.zipWithIndex.foreach { case (m, i) =>
        val pr = m("pct_rank").asInstanceOf[Double]
        val cd = m("cume").asInstanceOf[Double]
        if (n > 1) assert(pr == i.toDouble / (n - 1))
        assert(cd == (i + 1).toDouble / n)
      }
    }
  }

  test("skyline_parts: front is exactly the brute-force non-dominated set") {
    import spark.implicits._
    val front = rowsOf(Relational.queries("skyline_parts")(spark, dir))
      .map(m => (m("price_cents").asInstanceOf[Long],
        m("p_size").asInstanceOf[Int])).toSet
    assert(front.nonEmpty)
    // brute-force dominance over the distinct point set (tiny at sf0.001)
    val pts = Tables.part(spark, dir)
      .select(round($"p_retailprice" * 100).cast("long").as("pc"), $"p_size")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val expect = pts.filter { case (pc, sz) =>
      !pts.exists { case (qc, qz) =>
        qc <= pc && qz >= sz && (qc < pc || qz > sz) }
    }
    assert(front == expect, s"front=$front expect=$expect")
    // along increasing price the frontier's size strictly increases
    val byPrice = front.toSeq.sortBy(_._1).map(_._2)
    assert(byPrice == byPrice.distinct.sorted)
  }

  test("join_scd2: every non-first purchase attributes to exactly one " +
    "prior-state version; census reconciles") {
    import spark.implicits._
    val out = rowsOf(graft.operators.Keyed.queries("join_scd2")(spark, dir))
    assert(out.nonEmpty)
    val joined = out.map(_("n_purchases").asInstanceOf[Long]).sum
    // purchases that are their user's first-ever event have no prior
    // state and drop; everything else joins exactly once
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type", $"ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val purchases = ev.filter(_._3 == "purchase")
    val firstEvent = ev.groupBy(_._1).map { case (u, es) =>
      u -> es.minBy(e => (e._4, e._2))._2 }
    val expected = purchases.count(p => firstEvent(p._1) != p._2)
    assert(joined == expected.toLong,
      s"joined=$joined expected=$expected of ${purchases.length}")
    // revenue in the join equals the raw revenue of the attributed set
    val revOut = out.map(_("revenue_cents").asInstanceOf[Long]).sum
    val revRaw = rowsOf(Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .agg(sum(round($"value" * 100).cast("long")).as("r")))
      .head("r").asInstanceOf[Long]
    assert(revOut <= revRaw)
  }

  test("q6_forecast: all three predicates reach the parquet scan") {
    val df = Relational.queries("q6_forecast")(spark, dir)
    assert(rowsOf(df).head("n_lines").asInstanceOf[Long] > 0L)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pushed = formatted.linesIterator
      .filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
      pushed.contains("l_quantity"), pushed)
  }

  test("q7_nation_volume: only the two chosen nations in either role, " +
    "both directions present") {
    val rows = rowsOf(Relational.queries("q7_nation_volume")(spark, dir))
    assert(rows.nonEmpty)
    val pairs = rows.map(m => (m("supp_nation"), m("cust_nation"))).toSet
    assert(pairs.subsetOf(Set(("NATION_3", "NATION_7"), ("NATION_7", "NATION_3"))))
    rows.foreach(m => assert(m("revenue_cents").asInstanceOf[Long] > 0L))
  }

  test("q8_market_share: share_bps consistent with the two sums, bounded") {
    rowsOf(Relational.queries("q8_market_share")(spark, dir)).foreach { m =>
      val nc = m("nation_cents").asInstanceOf[Long]
      val tc = m("total_cents").asInstanceOf[Long]
      val bps = m("share_bps").asInstanceOf[Long]
      assert(nc >= 0L && nc <= tc)
      assert(bps == math.floor(nc * 10000.0 / tc).toLong)
      assert(bps >= 0L && bps <= 10000L)
    }
  }

  test("q10_returns: top-20 cut is a TakeOrderedAndProject, refunds " +
    "descend deterministically") {
    val df = Relational.queries("q10_returns")(spark, dir)
    val rows = rowsOf(df)
    assert(rows.size <= 20 && rows.nonEmpty)
    val refs = rows.map(m => (m("refund_cents").asInstanceOf[Long],
      m("c_custkey").asInstanceOf[Long]))
    assert(refs == refs.sortBy(r => (-r._1, r._2)))
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("q13_custdist: zero-order customers occupy the 0 bin; mass conserves") {
    import spark.implicits._
    val out = rowsOf(Relational.queries("q13_custdist")(spark, dir))
      .map(m => m("c_count").asInstanceOf[Long] ->
        m("custdist").asInstanceOf[Long]).toMap
    assert(out.nonEmpty)
    // every customer lands in exactly one bin
    assert(out.values.sum == Tables.customer(spark, dir).count())
    // order mass conserves: sum(bin * customers) = qualifying orders
    val qualifying = Tables.orders(spark, dir)
      .filter($"o_orderpriority" =!= "5-LOW")
      .join(Tables.customer(spark, dir),
        $"o_custkey" === $"c_custkey", "left_semi").count()
    assert(out.map { case (c, d) => c * d }.sum == qualifying)
    // the zero bin exists iff some customer has no qualifying orders
    val withOrders = Tables.orders(spark, dir)
      .filter($"o_orderpriority" =!= "5-LOW")
      .select($"o_custkey").distinct().count()
    val custs = Tables.customer(spark, dir).count()
    assert(out.contains(0L) == (withOrders < custs))
  }

  test("q19_disjunct: single-scan disjunction equals the union of the " +
    "three clause queries") {
    import spark.implicits._
    val out = rowsOf(Relational.queries("q19_disjunct")(spark, dir)).head
    def clause(brand: String, szLo: Int, szHi: Int, qLo: Long, qHi: Long) =
      Tables.lineitem(spark, dir)
        .join(Tables.part(spark, dir).filter($"p_brand" === brand &&
          $"p_size".between(szLo, szHi)), $"l_partkey" === $"p_partkey")
        .filter($"l_quantity".cast("long").between(qLo, qHi))
        .agg(coalesce(sum(round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
          .cast("long")), lit(0L)).as("r"), count(lit(1)).as("n"))
        .collect().head
    val parts = Seq(clause("Brand#1", 1, 10, 1L, 15L),
      clause("Brand#2", 11, 25, 10L, 25L),
      clause("Brand#3", 26, 50, 20L, 35L))
    // brands partition the parts, so the three clauses are disjoint
    assert(out("revenue_cents") == parts.map(_.getLong(0)).sum)
    assert(out("n_lines") == parts.map(_.getLong(1)).sum)
  }

  test("events_attribution: three credit models match the hand computation") {
    def ns(day: Long, sec: Long): Long = ((day * 86400L + sec) * 1000000L) * 1000L
    val fix = writeEventsFixture(Seq(
      // user 1: view, click, view -> purchase (all in window)
      (1L, ns(100, 0), 1L, "view", 1.0),
      (2L, ns(100, 60), 1L, "click", 1.0),
      (3L, ns(100, 120), 1L, "view", 1.0),
      (4L, ns(100, 180), 1L, "purchase", 1.0),
      // user 2: click 8 days early (outside) + click 1h before (inside)
      (5L, ns(92, 0), 2L, "click", 1.0),
      (6L, ns(100, 82800), 2L, "click", 1.0),
      (7L, ns(100, 86399), 2L, "purchase", 1.0),
      // user 3: purchase with no touches -> contributes nothing
      (8L, ns(100, 0), 3L, "purchase", 1.0),
      // user 4: error events are not touch channels
      (9L, ns(100, 0), 4L, "error", 1.0),
      (10L, ns(100, 60), 4L, "purchase", 1.0)))
    val out = rowsOf(graft.operators.Keyed.queries("events_attribution")(spark, fix))
      .map(m => m("channel").asInstanceOf[String] ->
        ((m("first_touch").asInstanceOf[Long],
          m("last_touch").asInstanceOf[Long],
          m("linear_micro").asInstanceOf[Long],
          m("n_touches").asInstanceOf[Long]))).toMap
    // u1: n=3, first=view(t0), last=view(t2); linear view 2/3, click 1/3
    // u2: n=1 (early click excluded), click takes all three models
    assert(out == Map(
      "view" -> ((1L, 1L, 666666L, 2L)),
      "click" -> ((1L, 1L, 1333333L, 2L))))
  }

  test("q4_order_priority: semi-join counts each order once regardless " +
    "of late-line multiplicity") {
    import spark.implicits._
    val out = rowsOf(Relational.queries("q4_order_priority")(spark, dir))
      .map(m => m("o_orderpriority").asInstanceOf[String] ->
        m("n_orders").asInstanceOf[Long]).toMap
    assert(out.nonEmpty)
    // brute force: distinct late order ids per priority
    val expect = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-04-01").cast("timestamp"))
      .join(Tables.lineitem(spark, dir),
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
      .select($"o_orderkey", $"o_orderpriority").distinct()
      .groupBy($"o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == expect)
    // the EXISTS is planned as a semi join, not an aggregate-then-join
    val plan = Relational.queries("q4_order_priority")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(400))
  }

  test("q11_important_stock: every kept nation clears 5% of the global " +
    "total and the fact table is scanned once") {
    val df = Relational.queries("q11_important_stock")(spark, dir)
    val kept = rowsOf(df).map(m => m("value_cents").asInstanceOf[Long])
    assert(kept.nonEmpty)
    val total = rowsOf(
      Tables.lineitem(spark, dir).agg(
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")).as("t"))).head("t").asInstanceOf[Long]
    kept.foreach(v => assert(v * 20 > total))
    // decorrelation holds: one scan of lineitem in the physical plan
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .count(_.contains("lineitem"))
    assert(scans == 1, s"expected 1 lineitem scan, got $scans")
  }

  test("q16_supplier_cnt: blocked suppliers never counted; anti join in plan") {
    import spark.implicits._
    val df = Relational.queries("q16_supplier_cnt")(spark, dir)
    assert(rowsOf(df).nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"))
    // recount one segment including blocked suppliers: must be >= the gated count
    val blocked = Tables.supplier(spark, dir)
      .filter($"s_acctbal" < 0).select($"s_suppkey")
    val withBlocked = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter($"p_type" =!= "ECONOMY"),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_size")
      .agg(countDistinct($"l_suppkey").as("all_cnt"))
    val joined = df.join(withBlocked, Seq("p_brand", "p_size"))
    assert(joined.filter($"supplier_cnt" > $"all_cnt").count() == 0)
    // if any blocked supplier shipped anything, some segment must shrink
    if (blocked.join(Tables.lineitem(spark, dir),
        $"s_suppkey" === $"l_suppkey", "left_semi").count() > 0) {
      assert(joined.filter($"supplier_cnt" < $"all_cnt").count() > 0)
    }
  }

  test("q20_promo_suppliers: every named supplier is dominant on some " +
    "red part (>30% of its 1997 volume)") {
    import spark.implicits._
    val names = rowsOf(Relational.queries("q20_promo_suppliers")(spark, dir))
      .map(_("s_name").asInstanceOf[String]).toSet
    assert(names.nonEmpty)
    val redLines = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .join(Tables.part(spark, dir).filter($"p_name".startsWith("red")),
        $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_suppkey", $"l_quantity".cast("long").as("qty"))
    val sp = redLines.groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"qty").as("sp")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val pTot = sp.groupBy(_._1._1).map { case (p, xs) => p -> xs.values.sum }
    val expectKeys = sp.collect {
      case ((p, s), q) if q * 10 > pTot(p) * 3 => s
    }.toSet
    val nameOf = Tables.supplier(spark, dir)
      .select($"s_suppkey", $"s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(names == expectKeys.map(nameOf))
  }

  test("mv_incremental_join: delta-algebra refresh is bit-equal to a " +
    "full recompute and the delta-orders term broadcasts") {
    import spark.implicits._
    val df = Relational.queries("mv_incremental_join")(spark, dir)
    val inc = rowsOf(df).map(m => (m("ym").asInstanceOf[Long],
      (m("revenue_cents").asInstanceOf[Long],
        m("n_lines").asInstanceOf[Long]))).toMap
    // naive recompute: one join over the complete tables
    val full = Tables.lineitem(spark, dir)
      .select($"l_orderkey",
        round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
          .cast("long").as("cents"))
      .join(Tables.orders(spark, dir).select($"o_orderkey",
        (year($"o_orderdate") * 100 + month($"o_orderdate"))
          .cast("long").as("ym")),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"ym")
      .agg(sum($"cents").as("rc"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(inc == full)
    // the explicit broadcast() of the delta-orders side survives planning
    assert(df.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }
}
