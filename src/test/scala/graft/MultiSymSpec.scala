package graft

import org.apache.spark.sql.functions._

/** Multi-symbol end-to-end: the fused cascade + position FSM keyed by
  * symbol (operators/MultiSym.scala). The per-symbol recursive-CTE oracle
  * hash-checks values; these specs assert the STRUCTURAL keying claims —
  * each symbol folds independently, and the keyed result restricted to
  * one symbol equals a single-symbol run of the same pure FSM. */
class MultiSymSpec extends SparkSpec {

  private lazy val fused =
    SparkEntry.queries("fused_multi")(spark, sfDir("sf0.001")).cache()
  private lazy val events =
    SparkEntry.queries("fsm_position_events_keyed")(spark, sfDir("sf0.001"))
      .cache()

  test("fused cascade runs per symbol with every symbol present") {
    val syms = fused.select("symbol").distinct().collect().map(_.getString(0))
    assert(syms.toSet == Set("S0", "S1", "S2", "S3"))
    // per-symbol z populations are independent: the same bucket may carry
    // different z per symbol (a global window would force one value)
    val zByBucket = fused.filter(col("z").isNotNull)
      .groupBy("bucket").agg(countDistinct("z").as("nz"))
      .filter(col("nz") > 1).count()
    assert(zByBucket > 0, "expected per-symbol z to differ within a bucket")
  }

  test("keyed FSM events alternate ENTER/EXIT independently per symbol") {
    val bySym = events.collect()
      .groupBy(_.getAs[String]("symbol"))
      .view.mapValues(_.sortBy(_.getAs[Long]("bucket"))).toMap
    assert(bySym.size >= 2, "expected events on several symbols")
    bySym.foreach { case (sym, evs) =>
      evs.zipWithIndex.foreach { case (e, i) =>
        val expected = if (i % 2 == 0) "ENTER" else "EXIT"
        assert(e.getAs[String]("action") == expected,
          s"$sym event $i should be $expected")
      }
      // every EXIT points back at its own symbol's preceding ENTER
      evs.grouped(2).foreach {
        case Array(en, ex) =>
          assert(ex.getAs[Long]("entry_bucket") == en.getAs[Long]("bucket"))
          assert(ex.getAs[Double]("entry_price") ==
            en.getAs[Double]("entry_price"))
        case _ => () // trailing unmatched ENTER at end-of-data is fine
      }
    }
  }

  test("keyed FSM at 1000 symbols: one shuffle, balanced partitions, every key folds") {
    import spark.implicits._
    import graft.state.Fsm
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val nSym = 1000
    val nBuckets = 240
    // deterministic synthetic signal frame: every symbol enters on the
    // 8-bucket cycle and the close path walks through its TP bracket, so
    // every symbol produces a full ENTER/EXIT event history
    val ins = spark.range(nSym.toLong * nBuckets).select(
      concat(lit("S"), col("id") % nSym).as("symbol"),
      expr(s"id div $nSym").as("bucket"))
      .withColumn("close",
        lit(100.0) + (col("bucket") % 10).cast("double"))
      .withColumn("high", col("close") + 3.0)
      .withColumn("low", col("close") - 3.0)
      .withColumn("side",
        when(col("bucket") % 8 === 0, "LONG").otherwise("NONE"))
      .withColumn("total_long", lit(0.8))
      .withColumn("total_short", lit(0.1))
      .withColumn("trail_arm", lit(false))
      .select($"bucket", $"close", $"high", $"low", $"side",
        $"total_long", $"total_short", $"trail_arm", $"symbol")
      .as[Fsm.FsmIn]
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val folded = ins.groupByKey(_.symbol)
        .flatMapSortedGroups(col("bucket"))(
          (_: String, it: Iterator[Fsm.FsmIn]) => Fsm.run(it))
        .toDF()
      // the whole pipeline pays exactly ONE exchange: the hash
      // partitioning on symbol that feeds the sorted group fold
      val plan = folded.queryExecution.executedPlan
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.size == 1,
        s"keyed fold must shuffle exactly once:\n${plan.treeString}")
      val t0 = System.nanoTime()
      val perPartition = folded.rdd
        .mapPartitions(it => Iterator(it.size.toLong), preservesPartitioning = true)
        .collect()
      val wallSec = (System.nanoTime() - t0) / 1e9
      // no skew collapse: 1000 hash-distributed keys spread across every
      // shuffle partition, none carrying more than 2x the mean
      val nonEmpty = perPartition.filter(_ > 0)
      assert(nonEmpty.length == perPartition.length,
        s"empty shuffle partitions: ${perPartition.mkString(",")}")
      val mean = perPartition.sum.toDouble / perPartition.length
      assert(perPartition.max <= 2.0 * mean,
        s"skewed fold partitions: ${perPartition.mkString(",")}")
      // every symbol folded: each produces its own event history, and
      // within the 240-bucket run each cycles ENTER->EXIT repeatedly
      val perSym = folded.groupBy("symbol").count()
      assert(perSym.count() == nSym)
      val (minEv, maxEv) = (perSym.agg(min("count"), max("count"))
        .head() match { case r => (r.getLong(0), r.getLong(1)) })
      assert(minEv == maxEv && minEv >= 50,
        s"identical per-symbol series must fold identically: $minEv..$maxEv")
      info(f"1000-symbol fold: ${perPartition.sum} events in $wallSec%.2f s " +
        s"across ${perPartition.length} partitions " +
        s"(rows ${perPartition.min}..${perPartition.max})")
    } finally conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("one symbol's slice through the keyed fold equals a single-symbol run") {
    import spark.implicits._
    import graft.state.Fsm
    // rebuild S1's FSM inputs from the fused frame and fold them alone
    val s1 = fused.filter($"symbol" === "S1")
      .select($"bucket", $"close", $"total_long", $"total_short", $"side")
      .collect().sortBy(_.getLong(0))
    // high/low are not in the public frame; the invariant checked here is
    // entry placement (close-driven), so replay with high=low=close and
    // compare ENTER events only — brackets need intrabar extremes
    val ins = s1.map(r => Fsm.FsmIn(r.getLong(0), r.getDouble(1),
      r.getDouble(1), r.getDouble(1), r.getString(4), r.getDouble(2),
      r.getDouble(3), trail_arm = false, symbol = "S1"))
    val replayEnters = Fsm.run(ins.iterator).filter(_.action == "ENTER")
      .map(e => e.bucket -> e.entry_price).toSeq.take(3)
    val keyedEnters = events.filter($"symbol" === "S1" && $"action" === "ENTER")
      .orderBy($"bucket").collect()
      .map(e => e.getAs[Long]("bucket") -> e.getAs[Double]("entry_price"))
      .toSeq.take(3)
    // first entry must coincide exactly (before bracket paths diverge on
    // the flattened high/low replay)
    assert(replayEnters.headOption == keyedEnters.headOption)
  }
}
