package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Asset-universe config scan (SURVEY.md §2.1 S1): the reference loads
  * its coin list from a YAML file (`src/coins.yaml:2-13`, read at
  * `src/etl.py:17-19`). The config is a single string list under one
  * key — a four-line grammar — so it is parsed directly rather than
  * pulling a YAML dependency the build intentionally doesn't have
  * (zero-egress: only Spark jars + scalatest resolve).
  *
  * Driver-side by design: a 10-entry config is not a distributed
  * dataset; the list feeds `isin` filters / seed DataFrames
  * (broadcast), exactly how the reference uses it.
  */
object ConfigSource {

  /** Parse the `key:\n  - value` YAML-list shape. Comments (#…) and
    * blank lines ignored; quotes stripped; preserves order, dedups. */
  def parseAssetList(content: String, key: String = "assets"): Seq[String] = {
    var inKey = false
    val out = scala.collection.mutable.LinkedHashSet[String]()
    content.linesIterator.foreach { raw =>
      val line = raw.replaceAll("#.*$", "")
      if (line.trim.nonEmpty) {
        val isTop = !raw.startsWith(" ") && !raw.startsWith("\t")
        if (isTop) inKey = line.trim == s"$key:"
        else if (inKey && line.trim.startsWith("- "))
          out += line.trim.stripPrefix("- ").trim.stripPrefix("\"").stripSuffix("\"")
            .stripPrefix("'").stripSuffix("'")
      }
    }
    out.toSeq
  }

  /** Load the asset universe from a coins.yaml-shaped file. */
  def loadAssets(path: String, key: String = "assets"): Seq[String] =
    parseAssetList(new String(Files.readAllBytes(Paths.get(path)), "UTF-8"), key)
}

/** Retry/backoff wrapper for live-source fetches (SURVEY.md §2.1 S4;
  * `src/coingecko.py:10-41`): exponential backoff capped at `maxDelay`
  * for retryable failures, matching the reference's tenacity config
  * (≤6 attempts, 1→30 s). Connector plumbing, not a Spark operator —
  * inside a DataSource V2 reader this wraps the per-partition fetch;
  * in driver-fetch mode it wraps the HTTP call.
  */
object Retry {

  /** Retryable failure (the reference maps HTTP 429 + transport errors
    * to its RateLimit/Transient exceptions, `src/coingecko.py:13-34`). */
  final class TransientError(msg: String, cause: Throwable = null)
      extends RuntimeException(msg, cause)

  /** Run `f`, retrying TransientError with exponential backoff:
    * delay_i = min(base * 2^i, maxDelay). Non-transient exceptions
    * propagate immediately. `sleep` is injectable for tests. */
  def withBackoff[T](attempts: Int = 6,
                     baseDelayMs: Long = 1000L,
                     maxDelayMs: Long = 30000L,
                     sleep: Long => Unit = Thread.sleep)(f: () => T): T = {
    var i = 0
    var delay = baseDelayMs
    while (true) {
      try return f()
      catch {
        case e: TransientError =>
          i += 1
          if (i >= attempts) throw e
          sleep(math.min(delay, maxDelayMs))
          delay = math.min(delay * 2, maxDelayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
