package graft

import graft.state.Fusion

/** Per-event reflex latency bench — the measurement behind the EP1
  * architecture call (PLANS.md §"Round-12 EP1 latency"): micro-batch
  * Structured Streaming has a ~400 ms trigger floor, so the
  * reference's 50 ms tick-to-decision budget (main.py:98,198;
  * BASELINE.md row 1) belongs in a per-event service running the
  * engine-agnostic [[Fusion.step]] fold — IF that fold is actually
  * microseconds per bar. This main measures it instead of asserting
  * it: N synthetic signal bars (deterministic LCG walk, full
  * 20-level book arrays so the book trio runs its real work) fold
  * single-threaded through the COMPLETE cascade — z-ring, EMA, trend
  * hysteresis, multi-TF LV, ATR%/Hurst/BOS rings, the scoring
  * cascade, and the position FSM — with a per-event nanotime stamp.
  * Warmup fills every trailing ring to capacity (the z ring is the
  * longest at [[Fusion.ZPop]] = 3000), so the reported percentiles
  * are the steady-state worst case where each step walks the full
  * ring, not the cheap cold start.
  *
  * Pure JVM — no SparkSession; that absence IS the architecture
  * being priced. Prints ONE JSON line (p50/p90/p99/p999/max in
  * microseconds, mean, events/sec). Not part of the driver
  * contract — run manually with `graft.ReflexBench` as the main class
  * (plain java, any classpath that holds the compiled classes).
  * Measures [[Fusion.hotStep]] (the per-event deployment transition;
  * SPARK_GRAFT_REFLEX_PURE=1 measures the immutable `step` instead).
  * The deployment JVM recipe that hit p99.9 ≈ 0.1 ms (PLANS.md
  * §"Round-14 reflex p99.9"): `-XX:+UseZGC -Xms2g -Xmx2g
  * -XX:+AlwaysPreTouch` under `taskset` spanning the mutator AND the
  * GC threads (pinning to ONE core starves ZGC and quadruples the
  * tail). Results live in PLANS.md §"Round-13 reflex latency" and
  * §"Round-14 reflex p99.9".
  */
object ReflexBench {

  def main(args: Array[String]): Unit = {
    val warm = sys.env.getOrElse("SPARK_GRAFT_REFLEX_WARM", "5000").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_REFLEX_N", "200000").toInt

    // deterministic LCG; the walk keeps the score cascade on realistic
    // inputs (regime flips, FSM entries/exits actually fire)
    var seed = 0x9E3779B97F4A7C15L
    def nextD(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 11).toDouble / (1L << 53).toDouble
    }
    var price = 100.0
    def bar(i: Int): Fusion.SigBar = {
      val drift = (nextD() - 0.5) * 0.4
      val open = price
      price = math.max(1.0, price + drift)
      val high = math.max(open, price) + nextD() * 0.3
      val low = math.min(open, price) - nextD() * 0.3
      val vol = 5.0 + nextD() * 20.0
      val buy = vol * nextD()
      val bids = Vector.fill(graft.operators.Book.Depth)(1.0 + nextD() * 5.0)
      val asks = Vector.fill(graft.operators.Book.Depth)(1.0 + nextD() * 5.0)
      Fusion.SigBar("SYM", new java.sql.Timestamp(i * 60000L), open, high,
        low, price, vol, buy, vol - buy, bids, asks,
        dp = 0.05 + nextD() * 0.2)
    }

    // SPARK_GRAFT_REFLEX_PURE=1 measures the immutable-ring `step`
    // (the pre-r14 path) instead of the deployment's `hotStep`
    val pure = sys.env.get("SPARK_GRAFT_REFLEX_PURE").contains("1")
    val zr = new Fusion.ZRing()
    var st = Fusion.init
    var i = 0
    while (i < warm) {
      st = (if (pure) Fusion.step(st, bar(i))
            else Fusion.hotStep(zr, st, bar(i)))._1
      i += 1
    }

    val lat = new Array[Long](n)
    var sink = 0L // blackhole: keep the JIT from eliding the fold
    var j = 0
    while (j < n) {
      val b = bar(warm + j)
      val t0 = System.nanoTime()
      val (st2, out) =
        if (pure) Fusion.step(st, b) else Fusion.hotStep(zr, st, b)
      lat(j) = System.nanoTime() - t0
      st = st2
      sink += out.total_long.toLong + out.side.length
      j += 1
    }

    java.util.Arrays.sort(lat)
    // standard nearest-rank: index ceil(p*n)-1 (not (p*n).toInt, which
    // reads one rank high — e.g. p50 of 200000 at index 100000)
    def pct(p: Double): Double =
      lat(math.max(0, math.min(n - 1, math.ceil(p * n).toInt - 1))) / 1000.0
    val totalNs = lat.sum
    val mean = totalNs / 1000.0 / n
    val evPerSec = n / (totalNs / 1e9)
    println(s"""{"metric":"reflex_step_latency","unit":"us",""" +
      s""""warmup":$warm,"events":$n,""" +
      s""""p50":${pct(0.50)},"p90":${pct(0.90)},"p99":${pct(0.99)},""" +
      s""""p999":${pct(0.999)},"max":${lat(n - 1) / 1000.0},""" +
      f""""mean":$mean%.3f,"events_per_sec":${evPerSec.toLong},""" +
      s""""ring":${if (pure) st.ring.length else zr.length},"pure":$pure,"sink":${sink % 7}}""")
  }
}
