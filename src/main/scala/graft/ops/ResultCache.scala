package graft.ops

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Compute-once holder: the TrieMap insertion race is decided
    * BEFORE the computation runs (putIfAbsent of an unforced holder),
    * so the loser of a concurrent miss never computes or caches
    * anything — compute-if-absent rather than compute-then-discard.
    *
    * All state is guarded by the Entry monitor, held across
    * `compute()` itself, so invalidation SERIALIZES with an in-flight
    * computation instead of racing it (the round-4 `@volatile
    * computed` flag was set only after `.cache()` returned, leaving a
    * window where `unpersistIfComputed` saw false and leaked the
    * Spark-cached plan for the session lifetime). Contention is
    * per-key only — distinct keys never share a monitor.
    *
    * A thrown computation leaves `value` empty, so the next caller
    * retries instead of caching the failure. Once `dead` (evicted /
    * invalidated), a late caller that still holds the Entry reference
    * gets a correct frame but nothing new is ever Spark-cached — an
    * evicted entry cannot re-acquire storage nobody will release. */
  private final class Entry(val at: Long, compute: () => DataFrame) {
    private var value: Option[DataFrame] = None // guarded by this
    private var dead = false                    // guarded by this
    def df: DataFrame = synchronized {
      value.getOrElse {
        val d = compute()
        if (!dead) { d.cache(); value = Some(d) }
        d
      }
    }
    /** Unpersist the Spark cache if some caller actually forced the
      * plan (forcing a never-used loser/stale entry just to unpersist
      * it would run the very computation we avoided), and mark the
      * entry dead so late callers never cache into the void. */
    def unpersistIfComputed(): Unit = synchronized {
      value.foreach(_.unpersist(blocking = false))
      dead = true // value is kept: a late caller reuses the computed
      //             (now uncached) plan instead of recomputing
    }
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
    * reads the winner's entry back; in the vanishingly rare remove
    * race (key vanished entirely), it serves its own frame UNCACHED —
    * marking it dead first, so an entry that never entered the map
    * can't acquire Spark storage nobody would ever release. */
  private def replaceStale(key: String, stale: Entry, fresh: Entry): DataFrame =
    if (memo.replace(key, stale, fresh)) {
      stale.unpersistIfComputed()
      fresh.df
    } else memo.get(key) match {
      case Some(current) => current.df
      case None => fresh.unpersistIfComputed(); fresh.df
    }

  /** Drop one entry, unpersisting its Spark cache. */
  def invalidate(key: String): Unit =
    memo.remove(key).foreach(_.unpersistIfComputed())

  /** Drop everything (test teardown / session stop). */
  def clear(): Unit = memo.keys.foreach(invalidate)

  def size: Int = memo.size
}

object ResultCache {
  /** Process-wide cache used by the query surface (Verify/Bench run
    * many queries over the same tables in one session). Keys embed
    * [[sessionKey]] and the data dir, so sessions/scale-factors
    * never collide — a UUID, unlike an identityHashCode, is never
    * reused after GC, so a new session can't be served a frame bound
    * to a dead one. Entries for stopped sessions linger until their
    * TTL/`clear()`; they hold only plan objects (the executor storage
    * died with the session), so the residue is driver-heap-bounded. */
  val shared = new ResultCache()

  /** Stable, never-reused identity for a session, for use in `shared`
    * keys. `identityHashCode` can be REUSED after the session is
    * GC'd, so a new session could be served a cached frame bound to a
    * dead one; a UUID cannot. (Spark's own `sessionUUID` lives on the
    * `classic` implementation class, not the public interface, so we
    * mint our own — weak keys, so the mapping dies with the session.) */
  private val sessionIds = new java.util.WeakHashMap[SparkSession, String]()
  def sessionKey(spark: SparkSession): String = sessionIds.synchronized {
    var id = sessionIds.get(spark)
    if (id == null) { id = java.util.UUID.randomUUID().toString; sessionIds.put(spark, id) }
    id
  }
}
