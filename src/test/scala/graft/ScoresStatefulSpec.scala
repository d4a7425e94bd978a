package graft

import graft.operators.{Scores, Stateful, Book, LongMemory}

/** Bounds/invariants for the fusion cascade and batch FSM replay on real
  * data (exact values are covered by the DuckDB oracle). */
class ScoresStatefulSpec extends SparkSpec {

  private lazy val fusion = rowsOf(
    Scores.queries("fusion_scores")(spark, sfDir()))

  test("all probability-like scores stay in [0,1]") {
    val cols = Seq("core_long", "core_short", "mc_long", "mc_short",
      "bayes_long", "bayes_short", "fused_long", "fused_short",
      "winprob_long", "winprob_short")
    assert(fusion.nonEmpty)
    fusion.foreach { m =>
      cols.foreach { c =>
        Option(m(c)).foreach { v =>
          val d = v.asInstanceOf[Double]
          assert(d >= 0.0 && d <= 1.0, s"$c = $d out of range")
        }
      }
    }
  }

  test("kelly is capped and non-negative") {
    fusion.foreach { m =>
      Seq("kelly_long", "kelly_short").foreach { c =>
        Option(m(c)).foreach { v =>
          val d = v.asInstanceOf[Double]
          assert(d >= 0.0 && d <= Scores.KellyCap)
        }
      }
    }
  }

  test("rl is present exactly when hurst is, and clamped") {
    fusion.foreach { m =>
      assert((m("rl") == null) == (m("hurst") == null))
      Option(m("rl")).foreach { v =>
        val d = v.asInstanceOf[Double]
        assert(d >= 0.01 && d <= 0.99)
      }
    }
  }

  test("entry side honors the gates") {
    fusion.foreach { m =>
      m("side") match {
        case "LONG" =>
          assert(m("total_long").asInstanceOf[Double] > Scores.EntryTotal)
          assert(m("winprob_long").asInstanceOf[Double] > Scores.EntryWinprob)
        case "SHORT" =>
          assert(m("total_short").asInstanceOf[Double] > Scores.EntryTotal)
          assert(m("winprob_short").asInstanceOf[Double] > Scores.EntryWinprob)
        case _ => ()
      }
    }
  }

  test("regime classification is total") {
    assert(fusion.map(_("regime")).toSet.subsetOf(
      Set[Any]("LOW", "NEUTRAL", "HIGH")))
  }

  test("book imbalance bounded in [-1,1]") {
    rowsOf(Book.queries("book_imbalance")(spark, sfDir())).foreach { m =>
      Option(m("imbalance")).foreach { v =>
        val d = v.asInstanceOf[Double]
        assert(d >= -1.0 && d <= 1.0)
      }
    }
  }

  test("microprice lies inside the touch and leans toward the heavy side") {
    val touch = rowsOf(Book.queries("book_touch")(spark, sfDir()))
      .map(m => m("bucket") -> m).toMap
    val rows = rowsOf(Book.queries("book_microprice")(spark, sfDir()))
    assert(rows.nonEmpty)
    rows.foreach { m =>
      val (bid, ask) = (m("bid_c").asInstanceOf[Long] / 100.0,
        m("ask_c").asInstanceOf[Long] / 100.0)
      val micro = m("microprice").asInstanceOf[Double]
      // a convex combination of the two quotes stays inside them
      assert(micro >= math.min(bid, ask) - 1e-9 &&
        micro <= math.max(bid, ask) + 1e-9)
      // heavier bid volume pulls the microprice toward the ask quote
      val (bv, av) = (m("bvol_c").asInstanceOf[Long], m("avol_c").asInstanceOf[Long])
      val mid = (bid + ask) / 2.0
      if (bv > av) assert((micro - mid) * (ask - mid) >= -1e-9)
      if (av > bv) assert((micro - mid) * (bid - mid) >= -1e-9)
      // the rank-1 quotes agree with book_touch's best levels
      touch.get(m("bucket")).foreach { t =>
        assert(math.abs(t("best_bid").asInstanceOf[Double] - bid) < 0.005 + 1e-9)
        assert(math.abs(t("best_ask").asInstanceOf[Double] - ask) < 0.005 + 1e-9)
      }
    }
  }

  test("hurst defined only on complete groups, in a sane band") {
    rowsOf(LongMemory.queries("lm_hurst")(spark, sfDir())).foreach { m =>
      if (m("n").asInstanceOf[Long] < LongMemory.HurstN)
        assert(m("hurst") == null)
      Option(m("hurst")).foreach { v =>
        val d = v.asInstanceOf[Double]
        assert(d > 0.0 && d < 1.0)
      }
    }
  }

  test("autocorrelation matches a from-scratch replay and stays in [-1, 1]") {
    import org.apache.spark.sql.functions._
    val out = rowsOf(LongMemory.queries("lm_autocorr")(spark, sfDir()))
      .map(m => m("lag").asInstanceOf[Long] ->
        ((m("acf").asInstanceOf[Double], m("n_pairs").asInstanceOf[Long])))
      .toMap
    assert(out.size == LongMemory.AcfMaxLag)
    val xs = graft.operators.Bars.ohlcDf(spark, sfDir())
      .select(col("bucket"), round(col("close") * 100).cast("long").as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(_._1)
    val byBucket = xs.toMap
    val n = xs.length.toLong
    val s = xs.map(_._2).sum
    val den = xs.map { case (_, x) => (n * x - s) * (n * x - s) }.sum
    (1 to LongMemory.AcfMaxLag).foreach { k =>
      val pairs = xs.flatMap { case (b, x) =>
        byBucket.get(b + k).map(y => (x, y)) }
      val num = pairs.map { case (x, y) => (n * x - s) * (n * y - s) }.sum
      val (acf, np) = out(k.toLong)
      assert(np == pairs.length.toLong)
      assert(acf == num.toDouble / den.toDouble, s"lag $k")
      assert(acf >= -1.0 && acf <= 1.0)
    }
  }

  test("FSM events from the batch replay pair up and respect cooldown") {
    val evs = rowsOf(Stateful.queries("fsm_position_events")(spark, sfDir()))
      .sortBy(_("bucket").asInstanceOf[Long])
    assert(evs.nonEmpty, "expected the sf0.001 replay to trade")
    val actions = evs.map(_("action"))
    actions.sliding(2).foreach {
      case Seq(a, b) => assert(a != b, "ENTER/EXIT must alternate")
      case _ => ()
    }
    evs.grouped(2).foreach {
      case Seq(e, x) if x("action") == "EXIT" =>
        assert(x("entry_bucket") == e("bucket"))
        assert(x("pnl") != null && x("reason") != null)
      case _ => ()
    }
    // cooldown: consecutive (EXIT at b) -> next ENTER at >= b + cooldown
    evs.sliding(2).foreach {
      case Seq(x, e) if x("action") == "EXIT" && e("action") == "ENTER" =>
        assert(e("bucket").asInstanceOf[Long] >=
          x("bucket").asInstanceOf[Long] + graft.state.Fsm.CooldownBuckets)
      case _ => ()
    }
  }

  test("daily summary reconciles with the event stream") {
    val evs = rowsOf(Stateful.queries("fsm_position_events")(spark, sfDir()))
      .filter(_("action") == "EXIT")
    val daily = rowsOf(Stateful.queries("fsm_daily_summary")(spark, sfDir()))
    assert(daily.map(_("n_trades").asInstanceOf[Long]).sum == evs.size.toLong)
    val sumPnl = daily.map(_("total_pnl").asInstanceOf[Double]).sum
    val evPnl = evs.map(_("pnl").asInstanceOf[Double]).sum
    assert(math.abs(sumPnl - evPnl) < 1e-9 * math.max(1.0, math.abs(evPnl)))
  }

  test("cumulative pnl is a prefix sum") {
    val c = rowsOf(Stateful.queries("fsm_cum_pnl")(spark, sfDir()))
      .sortBy(_("bucket").asInstanceOf[Long])
    var acc = 0.0
    c.foreach { m =>
      acc += m("pnl").asInstanceOf[Double]
      assert(math.abs(m("cum_pnl").asInstanceOf[Double] - acc) < 1e-9)
    }
  }

  test("hysteresis output is total and lags raw flips") {
    val t = rowsOf(Stateful.queries("trend_hysteresis")(spark, sfDir()))
      .sortBy(_("bucket").asInstanceOf[Long])
    assert(t.nonEmpty)
    t.sliding(2).foreach {
      case Seq(a, b) if a("confirmed") != b("confirmed") =>
        assert(b("raw") == b("confirmed"))
      case _ => ()
    }
  }

  test("hysteresis dial: flips fall and lag rises with k; k=2 matches " +
    "the shipped run") {
    val dir = sfDir()
    val rows = rowsOf(Stateful.queries("trend_hysteresis_curve")(spark, dir))
      .sortBy(_("k").asInstanceOf[Long])
    assert(rows.map(_("k")) === Stateful.HystCurveKs.map(_.toLong))
    assert(rows.map(_("n_buckets").asInstanceOf[Long]).distinct.size === 1)
    val flips = rows.map(_("n_flips").asInstanceOf[Long])
    assert(flips.zip(flips.tail).forall { case (a, b) => b <= a },
      "more confirmations can only flip less")
    val lag = rows.map(_("n_lagging").asInstanceOf[Long])
    // k=1 flips immediately: confirmed tracks raw exactly; any k>=2
    // pays real lag. (Lag is NOT strictly monotone in k: an FSM stuck
    // on an older trend can coincide with raw MORE often than a
    // faster one — 215 vs 214 at sf0.001's k=3/k=4 — so the honest
    // assertions are the endpoint and positivity, not the ordering.)
    assert(lag.head === 0L)
    assert(lag.tail.forall(_ > 0L))
    // the k=2 point IS the shipped FSM: recount its flips
    val shipped = rowsOf(Stateful.queries("trend_hysteresis")(spark, dir))
      .sortBy(_("bucket").asInstanceOf[Long])
      .map(_("confirmed").asInstanceOf[String])
    val shippedFlips = shipped.zip(shipped.tail).count { case (a, b) => a != b }
    assert(rows.find(_("k") == 2L).get("n_flips") === shippedFlips.toLong)
  }
}
