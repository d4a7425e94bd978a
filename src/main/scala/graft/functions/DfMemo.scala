package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, key) memo of persisted DataFrames, for intermediate
  * frames shared by several queries in one session (the fusion signal
  * frame feeds five queries; the FSM event stream feeds three).
  *
  * Lifecycle: the outer map is WEAK in the session, so a stopped and
  * dropped SparkSession releases its cached plans without anyone calling
  * `clear()`. Within a session the memo is an LRU bounded at
  * [[MaxResident]] entries: a long multi-family run (Bench's 70+ queries)
  * holds at most that many persisted frames at a time — the
  * least-recently-used one is unpersisted and forgotten when a new family
  * starts memoizing, instead of every family's frames accumulating for
  * the whole session (the round-2 bench-noise mechanism). Bench runs
  * queries in name order, so a family's queries touch their shared memo
  * consecutively and the LRU never thrashes within a family.
  */
object DfMemo {

  /** LRU cap per session. Large enough for the widest reuse distance in
    * the suite (the ANN recall family interleaves brute3 with the
    * per-rung frames — the PQ rung alone touches kmeans_comp /
    * kmeans_ranked / pq_resid / pq_cb on top of brute3 and ivf_ranked),
    * small enough to bound resident cache pressure. */
  val MaxResident: Int =
    sys.env.getOrElse("SPARK_GRAFT_MEMO_CAP", "8").toInt

  // Weak keys: a dropped session must not be pinned (with its whole
  // sessionState + persisted plans) for the life of the process.
  private val sessions =
    new java.util.WeakHashMap[SparkSession, java.util.LinkedHashMap[String, DataFrame]]()

  private def tableFor(spark: SparkSession) = sessions.synchronized {
    var m = sessions.get(spark)
    if (m == null) {
      // accessOrder = true: get() refreshes recency, giving true LRU
      m = new java.util.LinkedHashMap[String, DataFrame](16, 0.75f, true)
      sessions.put(spark, m)
    }
    m
  }

  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val tab = tableFor(spark)
    // access-order maps mutate on get: every touch needs the lock
    val existing = tab.synchronized(tab.get(key))
    if (existing != null) existing
    else {
      // Build OUTSIDE the lock: build closures may re-enter cached()
      // (Stateful.eventsDf -> Scores.scoredShared). A lost race is NOT
      // unpersisted: the loser's checkpoint RDD is freed by the
      // ContextCleaner once unreferenced.
      //
      // localCheckpoint, not persist: a persisted frame keeps its FULL
      // plan, and every downstream query re-pays per-execution overhead
      // proportional to that tree even when the data comes from cache
      // (measured ~1.9 s per access on the deep ANN chains vs ~0.1 s
      // through the truncated lineage). The checkpoint materializes the
      // rows once and hands consumers a LogicalRDD — the memo boundary
      // IS the lineage boundary, which is exactly what a shared
      // intermediate means. Local mode trades away recompute-on-loss;
      // a cluster deployment would use reliable checkpoint() instead.
      val built = build.localCheckpoint()
      tab.synchronized {
        val raced = tab.get(key)
        if (raced != null) raced
        else {
          tab.put(key, built)
          // LRU eviction: releasing is safe even if an already-built plan
          // still references the frame — it only drops the stored blocks,
          // the RDD recomputes (a perf, never a correctness, event).
          val it = tab.entrySet().iterator()
          while (tab.size() > MaxResident && it.hasNext) {
            release(it.next().getValue)
            it.remove()
          }
          built
        }
      }
    }
  }

  /** Free a memoized frame's storage eagerly. A localCheckpoint'ed frame
    * is backed by a persisted RDD that `df.unpersist()` does not touch
    * (no CacheManager entry) — without this, evicted checkpoints wait
    * for the ContextCleaner's GC cycle to release their blocks. */
  private def release(df: DataFrame): Unit =
    try df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
        ()
      case _ =>
        df.unpersist()
        ()
    } catch { case _: Throwable => () }

  /** Release and forget everything (idempotent; tests + long services). */
  def clear(): Unit = sessions.synchronized {
    sessions.values.forEach { tab =>
      tab.values.forEach(release)
      tab.clear()
    }
    sessions.clear()
  }
}
