package graft

import java.sql.Timestamp
import graft.state.Fusion
import graft.state.Fusion.SigBar

/** Properties of the pure fused transition (the EP1 hot path): score
  * bounds, event alternation, and per-symbol isolation of the fold. */
class FusionSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def bar(sym: String, m: Int, p: Double, buyQ: Double,
      sellQ: Double = 1.0): SigBar =
    SigBar(sym, ts(m * 60L), p, p, p, p, buyQ + sellQ, buyQ, sellQ)

  private def seededBars(sym: String, n: Int, seed: Int): Seq[SigBar] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { m =>
      val p = 90.0 + rnd.nextDouble() * 20.0
      SigBar(sym, ts(m * 60L), p, p + rnd.nextDouble(),
        p - rnd.nextDouble(), p + rnd.nextDouble() - 0.5,
        1.0 + rnd.nextDouble() * 5.0,
        rnd.nextDouble() * 3.0, rnd.nextDouble() * 3.0)
    }
  }

  test("fused scores stay in [0,1]; z respects the population minimum") {
    val out = Fusion.run(seededBars("S", 500, 7).iterator).toList
    assert(out.size == 500)
    out.foreach { o =>
      assert(o.total_long >= 0.0 && o.total_long <= 1.0, s"long ${o.total_long}")
      assert(o.total_short >= 0.0 && o.total_short <= 1.0, s"short ${o.total_short}")
      assert(o.cvd >= -1.0 && o.cvd <= 1.0)
      assert(Set("UPTREND", "DOWNTREND", "RANGEBOUND").contains(o.trend))
    }
    // no z before the minimum population, some z after
    assert(out.take(Fusion.ZMin - 1).forall(_.z.isEmpty))
    assert(out.drop(Fusion.ZMin).exists(_.z.isDefined))
  }

  test("FSM events strictly alternate ENTER/EXIT with pnl only on exits") {
    // alternating spikes force entries; price jumps force bracket exits
    val bars = (0 until 120).map { m =>
      val p = if (m % 10 == 7) 110.0 else 100.0
      val buyQ = if (m % 10 == 5) 60.0 else 1.0 + 0.1 * (m % 4)
      bar("S", m, p, buyQ)
    }
    val evs = Fusion.run(bars.iterator).toList.flatMap(o =>
      o.action.map(a => (a, o.pnl, o.reason)))
    assert(evs.nonEmpty)
    evs.grouped(2).foreach {
      case Seq(("ENTER", pnlE, reasonE), rest @ _*) =>
        assert(pnlE.isEmpty && reasonE.isEmpty)
        rest.foreach { case (a, pnl, reason) =>
          assert(a == "EXIT" && pnl.isDefined && reason.isDefined)
        }
      case other => fail(s"event stream out of order: $other")
    }
  }

  test("hotStep over the preallocated ZRing equals step bit-for-bit past saturation") {
    // full-surface bars (books + dp so the whole cascade runs), folded
    // well past ZPop so the ring wraps and evicts; every FusedOut field
    // must be EQUAL — the two paths share stepCore and the z folds walk
    // the identical oldest->newest order, so == here is bit-parity on
    // the doubles (the EP1 deployment guarantee)
    val rnd = new scala.util.Random(1234)
    var price = 100.0
    val bars = (0 until Fusion.ZPop + 500).map { m =>
      val drift = (rnd.nextDouble() - 0.5) * 0.4
      val open = price
      price = math.max(1.0, price + drift)
      val vol = 5.0 + rnd.nextDouble() * 20.0
      val buy = vol * rnd.nextDouble()
      SigBar("S", ts(m * 60L), open,
        math.max(open, price) + rnd.nextDouble() * 0.3,
        math.min(open, price) - rnd.nextDouble() * 0.3,
        price, vol, buy, vol - buy,
        Vector.fill(graft.operators.Book.Depth)(1.0 + rnd.nextDouble() * 5.0),
        Vector.fill(graft.operators.Book.Depth)(1.0 + rnd.nextDouble() * 5.0),
        dp = 0.05 + rnd.nextDouble() * 0.2)
    }
    val zr = new Fusion.ZRing()
    var sp = Fusion.init // pure path
    var sh = Fusion.init // hot path
    bars.zipWithIndex.foreach { case (b, i) =>
      val (sp2, op) = Fusion.step(sp, b)
      val (sh2, oh) = Fusion.hotStep(zr, sh, b)
      assert(op == oh, s"outputs diverged at bar $i")
      // every state field except the ring representation must agree
      assert(sp2.copy(ring = Vector.empty) == sh2.copy(ring = Vector.empty),
        s"states diverged at bar $i")
      sp = sp2; sh = sh2
    }
    assert(zr.length == Fusion.ZPop) // the ring really saturated
  }

  test("symbols fold independently: interleaved corpus equals per-symbol runs") {
    import spark.implicits._
    val a = seededBars("AAA", 120, 11)
    val b = seededBars("BBB", 120, 23)
    // batch path groups by symbol — the interleaved union must produce
    // exactly the concatenation of the two isolated folds
    val merged = Streams.fusedBatch(
      spark.createDataset(scala.util.Random.shuffle(a ++ b)))
      .collect().toList
    val isolated =
      Fusion.run(a.iterator).toList ++ Fusion.run(b.iterator).toList
    assert(merged.toSet == isolated.toSet)
    assert(merged.size == isolated.size)
  }

  private def Streams = graft.streaming.Streams
}
