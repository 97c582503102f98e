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

  /** Lazy holder: the TrieMap insertion race is decided BEFORE the
    * computation runs (putIfAbsent of an unforced holder), so the
    * loser of a concurrent miss never computes or caches anything —
    * compute-if-absent rather than compute-then-discard. A thrown
    * computation leaves the lazy val uninitialized, so the next
    * caller retries instead of caching the failure. */
  private final class Entry(val at: Long, compute: () => DataFrame) {
    @volatile private var computed = false
    lazy val df: DataFrame = { val d = compute().cache(); computed = true; d }
    /** Unpersist only if some caller actually forced the plan —
      * forcing a never-used loser/stale entry just to unpersist it
      * would run the very computation we avoided. */
    def unpersistIfComputed(): Unit =
      if (computed) df.unpersist(blocking = false)
  }
  private val memo = TrieMap.empty[String, Entry]

  /** Return the cached DataFrame for `key`, computing (and Spark-
    * caching) it on miss or TTL expiry. Concurrent callers of the
    * same key agree on one winner; exactly one computation runs. */
  def getOrCompute(key: String)(compute: => DataFrame): DataFrame = {
    val now = clock()
    val fresh = new Entry(now, () => compute)
    memo.get(key) match {
      case Some(e) if now - e.at < ttlMs => e.df
      case None =>
        memo.putIfAbsent(key, fresh) match {
          case None => fresh.df
          case Some(raced) if now - raced.at < ttlMs => raced.df
          case Some(stale) => replaceStale(key, stale, fresh)
        }
      case Some(stale) => replaceStale(key, stale, fresh)
    }
  }

  /** CAS the expired entry out; whoever wins unpersists it. A loser
    * reads the winner's entry back (or, in the vanishingly rare
    * remove race, serves its own un-memoized frame). */
  private def replaceStale(key: String, stale: Entry, fresh: Entry): DataFrame =
    if (memo.replace(key, stale, fresh)) {
      stale.unpersistIfComputed()
      fresh.df
    } else memo.get(key).getOrElse(fresh).df

  /** Drop one entry, unpersisting its Spark cache. */
  def invalidate(key: String): Unit =
    memo.remove(key).foreach(_.unpersistIfComputed())

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
