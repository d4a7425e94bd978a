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
    * the suite — the ANN family's concurrently-live set is the widest:
    * the PQ rung holds ivf_ranked / kmeans_comp / kmeans_ranked /
    * kmeans2_ranked / multi_sig / pq_rsub / pq_cb / pq_code, and
    * ann_pq_topk adds pq_recon + pq_approx on top (10 live) before
    * ann_recall_curve re-reads the earlier rungs. 12 keeps one spare
    * over that peak so a single new memo key cannot evict a frame whose
    * rebuild is a full Lloyd iteration; small enough to bound resident
    * cache pressure. */
  val MaxResident: Int =
    sys.props.get("graft.memo.cap")
      .orElse(sys.env.get("SPARK_GRAFT_MEMO_CAP"))
      .getOrElse("12").toInt

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
          // LRU eviction drops the REFERENCE only. A checkpoint's blocks
          // are its ONLY copy (lineage is truncated — LocalCheckpointRDD
          // cannot recompute), so unpersisting here would crash any
          // already-built plan that still references the frame with
          // "Checkpoint block not found". The ContextCleaner frees the
          // blocks once the last reference is gone — delayed, but safe.
          val it = tab.entrySet().iterator()
          while (tab.size() > MaxResident && it.hasNext) {
            it.next()
            it.remove()
          }
          built
        }
      }
    }
  }

  /** Free a checkpointed frame's storage eagerly. ONLY safe when the
    * caller knows no live plan references the frame: a localCheckpoint's
    * blocks are its only copy (`df.unpersist()` would be a no-op — no
    * CacheManager entry — while the backing RDD cannot recompute), so
    * releasing a frame someone still holds fails their next execution.
    * Used by iterative drivers (label propagation) for superseded
    * per-round snapshots, which by construction nothing references. */
  private[graft] def release(df: DataFrame): Unit =
    try df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
        ()
      case _ =>
        df.unpersist()
        ()
    } catch { case _: Throwable => () }

  /** Forget everything (idempotent; tests + long services). References
    * drop; the ContextCleaner frees checkpoint blocks once consumers
    * let go — an eager release here would break frames still held. */
  def clear(): Unit = sessions.synchronized {
    sessions.values.forEach(_.clear())
    sessions.clear()
  }
}
