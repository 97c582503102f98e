package graft.ops

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/** TTL result cache — the reference dashboard's view memoization
  * (`apps/streamlit-dashboard/app.py:33-51`: `@st.cache_data(ttl=…)`
  * around every view read) as a library utility (SURVEY.md §2.1 S8).
  *
  * Entries are Spark-cached DataFrames keyed by a caller-chosen
  * string; a hit returns the same cached plan, so every consumer of a
  * shared intermediate (the dashboard overview feeding both the table
  * and the KPI row; the exact top-k feeding several recall reports)
  * evaluates it once per process instead of once per consumer.
  *
  * Scale posture: `.cache()` is executor-memory-backed (MEMORY_AND_DISK)
  * — the right shape for shared scans at any scale; the TTL mirrors
  * the reference's staleness contract and unpersists on expiry so a
  * long-lived service doesn't pin stale storage.
  */
final class ResultCache(ttlMs: Long = Long.MaxValue,
                        clock: () => Long = () => System.currentTimeMillis()) {

  private case class Entry(df: DataFrame, at: Long)
  private val memo = TrieMap.empty[String, Entry]

  /** Return the cached DataFrame for `key`, computing (and Spark-
    * caching) it on miss or TTL expiry. */
  def getOrCompute(key: String)(compute: => DataFrame): DataFrame = {
    val now = clock()
    memo.get(key) match {
      case Some(e) if now - e.at < ttlMs => e.df
      case stale =>
        stale.foreach(_.df.unpersist(blocking = false))
        val df = compute.cache()
        memo.put(key, Entry(df, now))
        df
    }
  }

  /** Drop one entry, unpersisting its Spark cache. */
  def invalidate(key: String): Unit =
    memo.remove(key).foreach(_.df.unpersist(blocking = false))

  /** Drop everything (test teardown / session stop). */
  def clear(): Unit = memo.keys.foreach(invalidate)

  def size: Int = memo.size
}

object ResultCache {
  /** Process-wide cache used by the query surface (Verify/Bench run
    * many queries over the same tables in one session). Keys embed the
    * session identity and data dir, so sessions/scale-factors never
    * collide. */
  val shared = new ResultCache()
}
