package graft.functions

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, key) memo of persisted DataFrames, for intermediate
  * frames shared by several queries in one session (the fusion signal
  * frame feeds five queries; the FSM event stream feeds three).
  *
  * Lifecycle: entries live until `clear()` (tests / long-lived services)
  * or session shutdown — cached blocks die with their SparkSession
  * either way, and `clear()` unpersists eagerly. Verify/Bench sessions
  * are short-lived one-shots, where memoization is pure win.
  */
object DfMemo {
  private val memo = new ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = (spark, key)
    val existing = memo.get(k)
    if (existing != null) existing
    else {
      // Build OUTSIDE the map's lock: build closures may re-enter cached()
      // (Stateful.eventsDf -> Scores.scoredShared), and computeIfAbsent
      // forbids recursive mutation of the same ConcurrentHashMap. A lost
      // race is NOT unpersisted: Spark's CacheManager keys cached data by
      // logical plan, so both racers share ONE cache entry — unpersisting
      // the loser would evict the winner's cache too.
      val built = build.persist()
      val raced = memo.putIfAbsent(k, built)
      if (raced != null) raced else built
    }
  }

  /** Unpersist and forget everything (idempotent). */
  def clear(): Unit = {
    memo.forEach((_, df) =>
      try df.unpersist() catch { case _: Throwable => () })
    memo.clear()
  }
}
