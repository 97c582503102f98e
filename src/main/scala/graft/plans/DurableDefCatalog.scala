package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.ops.ManifestTable

/** The durable-catalog mechanics [[MvRegistry]] and [[MvJoinRegistry]]
  * share, held ONCE: zero-padded `<prefix>NNNN` slot allocation with
  * in-place reuse (the prop-key sort IS the registration try order),
  * the per-(owner, version) decode memo, a TTL'd latest-version probe
  * for the planner path, and corrupt-prop tolerance (an undecodable
  * value is skipped on lookup and swept on remove — never a planner
  * crash).
  *
  * PROBE SEMANTICS: [[lookup]] runs inside the optimizer for every
  * candidate plan shape, so the latest-version listing is cached for
  * [[ProbeTtlMs]]. [[persist]]/[[remove]] invalidate the cache, so a
  * session always reads its own catalog writes immediately; a catalog
  * commit from a FOREIGN process is discovered within the TTL — and a
  * stale probe only delays a rewrite (the query falls back to the
  * scan, correct by construction), never serves stale data (freshness
  * is adjudicated downstream against pinned view versions). */
private[plans] final class DurableDefCatalog[D](
    prefix: String,
    encode: D => String,
    decode: (String, String) => Option[D],
    sameSlot: (D, D) => Boolean) {

  private val ProbeTtlMs = 10000L
  private val versionProbe =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Option[Long])]
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Vector[D]]

  private def ownerProps(spark: SparkSession, owner: String): Map[String, String] =
    try ManifestTable.readProps(spark, owner).filter(_._1.startsWith(prefix))
    catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** Commit `d` into its slot on `owner`'s manifest (reusing the slot
    * of an existing def with the same identity, so the try order is
    * stable across re-registration). */
  def persist(spark: SparkSession, owner: String, ownerQ: String, d: D,
              retainVersions: Int): Unit = {
    val existing = ownerProps(spark, owner)
    val slot = existing.collectFirst {
      case (k, v) if decode(owner, v).exists(sameSlot(_, d)) => k
    }.getOrElse {
      val used = existing.keys.flatMap(_.stripPrefix(prefix).toIntOption)
      f"$prefix${if (used.isEmpty) 0 else used.max + 1}%04d"
    }
    ManifestTable.updateMvDefProps(spark, owner,
      adds = Map(slot -> encode(d)), removeKeys = _ == slot,
      retainVersions = retainVersions)
    versionProbe.remove(ownerQ) // read-your-writes for this session
  }

  /** Remove every def on `owner` matching `matches`; an UNDECODABLE
    * prop also drops (remove is the corrupt-entry janitor). */
  def remove(spark: SparkSession, owner: String, ownerQ: String,
             matches: D => Boolean, retainVersions: Int): Unit = {
    val drop = ownerProps(spark, owner).collect {
      case (k, v) if decode(owner, v).forall(matches) => k
    }.toSet
    ManifestTable.updateMvDefProps(spark, owner,
      adds = Map.empty, removeKeys = drop, retainVersions = retainVersions)
    versionProbe.remove(ownerQ)
  }

  /** The committed defs at `owner`'s latest version, prop-key order.
    * Only SUCCESSFUL reads are memoized: a transient readPropsAt
    * failure returns empty for THIS call but is retried on the next
    * lookup — caching it would silently disable every durable rewrite
    * for the (owner, version) until the version bumps, a long-lived
    * perf regression on a stable table. */
  def lookup(spark: SparkSession, owner: String, ownerQ: String): Vector[D] =
    latestVersion(spark, owner, ownerQ) match {
      case None => Vector.empty
      case Some(v) =>
        val k = (ownerQ, v)
        val cached = memo.get(k)
        if (cached != null) cached
        else {
          val read =
            try Some(ManifestTable.readPropsAt(spark, owner, v).toVector
              .filter(_._1.startsWith(prefix)).sortBy(_._1)
              .flatMap { case (_, value) => decode(owner, value) })
            catch { case scala.util.control.NonFatal(_) => None }
          read match {
            case Some(defs) =>
              if (memo.size > 512) memo.clear()
              memo.put(k, defs)
              defs
            case None => Vector.empty
          }
        }
    }

  private def latestVersion(spark: SparkSession, owner: String,
                            ownerQ: String): Option[Long] = {
    val now = System.currentTimeMillis()
    val cached = versionProbe.get(ownerQ)
    if (cached != null && now - cached._1 < ProbeTtlMs) cached._2
    else {
      val v =
        try ManifestTable.versions(new Path(owner).getFileSystem(
          spark.sparkContext.hadoopConfiguration), owner).lastOption
        catch { case scala.util.control.NonFatal(_) => None }
      if (versionProbe.size > 1024) versionProbe.clear()
      versionProbe.put(ownerQ, (now, v))
      v
    }
  }
}
