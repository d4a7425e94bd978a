package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import graft.streaming.Streams.Trade

/** Streaming hot-path latency bench — measures the EP1 cascade
  * (tick burst -> windowed signal-bar aggregation -> the keyed
  * [[graft.state.Fusion]] fold incl. the position FSM) against the
  * reference's operating envelope (BASELINE.md: 20 Hz loop, <50 ms
  * tick-to-decision, `main.py:98,198`).
  *
  * Method: a MemoryStream of trades; each round lands one minute of
  * ticks for every symbol and `processAllAvailable()` drains it — the
  * measured wall time is data-available -> every derived row emitted
  * (bar finalization + fusion fold + sink), i.e. trigger-to-emit for
  * that burst. Rounds after warmup produce one finalized bar per
  * symbol per trigger (watermark 0s: minute m closes when minute m+1
  * opens). Reported: p50/p99 trigger latency at 1 symbol and at 1000
  * symbols, plus the per-tick amortized cost at 1000 (the number that
  * scales — micro-batch fixed overhead amortizes across every symbol
  * in the trigger, which is how Structured Streaming meets a 20 Hz
  * multi-symbol feed that a per-event engine meets per tick).
  *
  * Prints ONE JSON line; writes nothing to disk beyond its own temp
  * checkpoints (removed on exit). Not part of the driver contract —
  * run manually: `sbt "runMain graft.LatencyBench"`. Results are
  * recorded in PLANS.md §"EP1 latency".
  */
object LatencyBench {

  private def percentile(sorted: Seq[Double], p: Double): Double =
    if (sorted.isEmpty) Double.NaN
    else sorted(math.min(sorted.size - 1, math.ceil(p * sorted.size).toInt - 1).max(0))

  /** Run `rounds` one-minute tick bursts through the cascade; return
    * post-warmup per-trigger wall millis. */
  private def measure(spark: SparkSession, nSym: Int, ticksPerSym: Int,
      rounds: Int, warmup: Int): Seq[Double] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Trade]
    val out = Streams.fusedStream(
      Streams.signalBars(input.toDS(), watermark = "0 seconds"))
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"graft_latbench_$nSym").toString
    @volatile var emitted = 0L
    val q = out.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.state.Fusion.FusedOut], _: Long) =>
        emitted += b.count() // force full evaluation of every emitted row
        ()
      }
      .start()
    val base = 1700000000000L
    val durations = Vector.newBuilder[Double]
    try {
      (0 until rounds).foreach { r =>
        val minute = base + r * 60000L
        val burst = (0 until nSym).flatMap { s =>
          (0 until ticksPerSym).map { i =>
            val ts = minute + i * (60000L / ticksPerSym)
            // deterministic pseudo-walk: exercises z/EMA/trend/LV state
            val px = 100.0 + s % 7 + ((r * 31 + i * 7 + s * 13) % 17) * 0.25
            Trade(s"S$s", new Timestamp(ts), px,
              1.0 + (i % 5) * 0.5, isBuyerMaker = (r + i + s) % 3 == 0)
          }
        }
        val t0 = System.nanoTime()
        input.addData(burst)
        q.processAllAvailable()
        val ms = (System.nanoTime() - t0) / 1e6
        if (r >= warmup) durations += ms
      }
    } finally {
      q.stop()
      graft.functions.Fs.deleteRecursively(new java.io.File(ckpt))
    }
    require(emitted > 0, "latency bench emitted no fused rows")
    durations.result()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val parts = sys.env.getOrElse("SPARK_GRAFT_LAT_PARTS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // latency, not throughput: every micro-batch pays one state-store
      // commit per shuffle partition per stateful operator, so FEWER
      // partitions = less fixed per-trigger overhead (4 still spreads
      // 1000 symbols 250 keys/partition — each key is O(ring) state)
      .config("spark.sql.shuffle.partitions", parts)
      // windowed-agg finalization then rides the NEXT data batch instead
      // of a separate empty watermark-advance batch — one batch per
      // trigger, not two
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ticksPerSym = 20 // ticks per symbol-minute in each burst
    val one = measure(spark, nSym = 1, ticksPerSym = ticksPerSym,
      rounds = 70, warmup = 10).sorted
    val many = measure(spark, nSym = 1000, ticksPerSym = ticksPerSym,
      rounds = 30, warmup = 5).sorted
    def r1(x: Double) = math.round(x * 10.0) / 10.0
    // p50 trigger ms -> microseconds per tick at 1000 symbols
    val perTick1000 = r1(percentile(many, 0.5) * 1000.0 / (1000.0 * ticksPerSym))
    val json =
      s"""{"metric":"ep1_trigger_to_emit","unit":"ms",""" +
        s""""p50_ms_1sym":${r1(percentile(one, 0.5))},""" +
        s""""p99_ms_1sym":${r1(percentile(one, 0.99))},""" +
        s""""p50_ms_1000sym":${r1(percentile(many, 0.5))},""" +
        s""""p99_ms_1000sym":${r1(percentile(many, 0.99))},""" +
        s""""us_per_tick_1000sym":$perTick1000,""" +
        s""""ticks_per_trigger_1000sym":${1000 * ticksPerSym}}"""
    // ONE machine-readable line on stdout (same contract style as Bench)
    println(json)
    spark.stop()
  }
}
