package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.Schemas
import graft.sources.Retry

/** DataSource V2 adapter for the reference's `market_chart` REST
  * payloads (SURVEY.md §2.1 S2-S4) — the live-ingest shape: the
  * reference fetches per-coin JSON over HTTPS with retry/backoff
  * (`/root/reference/src/coingecko.py:36-90`). Each input partition
  * is one payload — a live http(s) endpoint (one GET per partition,
  * executed on the executor under the retry policy: the reference's
  * per-(coin, window) fetch) or a fixture file. SourcesSpec exercises
  * the HTTP path against a loopback server, including a transient-5xx
  * retry.
  *
  * Demonstrated connector mechanics, all public DSv2 API:
  *   - `TableProvider`/`SupportsRead` with a declared fixed schema;
  *   - partition planning: one `InputPartition` per payload →
  *     parallel fetch across executors (vs the reference's sequential
  *     per-coin loop, `src/etl.py:34`);
  *   - per-partition retry via [[Retry.withBackoff]] INSIDE the
  *     reader — where transient HTTP failures belong at scale;
  *   - top-level column pruning (`SupportsPushDownRequiredColumns`):
  *     `select coin_id` never materializes the arrays.
  *
  * Usage: `spark.read.format(classOf[ChartDataSource].getName)
  *   .load(pathPattern)` — newline-delimited JSON objects with
  *   coin_id + the three parallel `[[ms, v], …]` arrays.
  */
class ChartDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Schemas.marketChart
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChartTable(schema)
  override def supportsExternalMetadata(): Boolean = true
}

class ChartTable(schema: StructType) extends Table with SupportsRead {
  override def name(): String = "graft_market_chart"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ChartScanBuilder(paths(options))

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val single = Seq(Option(options.get("path"))).flatten
    // DataFrameReader.load(p1, p2, ...) encodes multiple paths as a
    // JSON array string (`["a","b"]`) in the "paths" option; a bare
    // comma-separated list is also accepted as a manual convention.
    val multi = Option(options.get("paths")).toSeq.flatMap { raw =>
      val trimmed = raw.trim
      if (trimmed.startsWith("[")) {
        val node = new ObjectMapper().readTree(trimmed)
        require(node.isArray, s"unparseable paths option: $raw")
        node.elements().asScala.map(_.asText()).toSeq
      } else trimmed.split(",").map(_.trim).toSeq
    }.filter(_.nonEmpty)
    (single ++ multi).distinct
  }
}

class ChartScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = Schemas.marketChart

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source field order; an empty projection (count(*)) is legal
    required = StructType(Schemas.marketChart.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new ChartScan(paths, required)
}

class ChartScan(paths: Seq[String], required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    // one partition per payload = one "API response" per task; http(s)
    // endpoints are planned as-is (one fetch per partition — the live
    // per-(coin, window) shape), local paths expand directories
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI("file:///"),
      new org.apache.hadoop.conf.Configuration())
    paths.flatMap { p =>
      if (ChartReader.isHttp(p)) Array(ChartPartition(p))
      else {
        val path = new org.apache.hadoop.fs.Path(p)
        if (fs.getFileStatus(path).isDirectory)
          fs.listStatus(path).filter(_.isFile).map(s => ChartPartition(s.getPath.toString))
        else Array(ChartPartition(p))
      }
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ChartReaderFactory(required)
}

case class ChartPartition(path: String) extends InputPartition

class ChartReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ChartReader(partition.asInstanceOf[ChartPartition].path, required)
}

object ChartReader {
  def isHttp(path: String): Boolean =
    path.startsWith("http://") || path.startsWith("https://")
}

/** Per-partition reader: the fetch — a live HTTP GET for http(s)
  * partitions, a file read for fixture partitions — runs under the
  * reference's retry policy (429/5xx/transport → retryable, other 4xx
  * → hard, `src/coingecko.py:13-34` semantics); JSON decodes with the
  * payload schema. */
class ChartReader(path: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()

  // Status semantics (429/5xx/transport retryable, other 4xx hard)
  // live in the shared graft.sources.Http helper — one contract for
  // this executor-side reader and the driver-side markets fetch.
  private def fetchHttp(): Vector[String] =
    graft.sources.Http.getBody(path)
      .linesIterator.filter(_.trim.nonEmpty).toVector

  private def readLocal(): Vector[String] = {
    // Space-safe local path resolution: Hadoop's Path.toString emits
    // "file:/a b" WITHOUT percent-encoding, so new URI(path) throws on
    // spaces — strip the scheme instead (Paths.get handles raw
    // spaces, and collapses the optional "//" authority slashes). The
    // Source is closed as soon as the lines are materialized — no
    // per-partition handle leak across a long scan.
    val local = java.nio.file.Paths.get(
      if (path.startsWith("file:")) path.stripPrefix("file:") else path)
    val src = scala.io.Source.fromFile(local.toFile, "UTF-8")
    try src.getLines().filter(_.trim.nonEmpty).toVector
    finally src.close()
  }

  private val lines: Iterator[String] = Retry.withBackoff(baseDelayMs = 100L) { () =>
    if (ChartReader.isHttp(path)) fetchHttp() else readLocal()
  }.iterator

  private var current: InternalRow = _

  override def next(): Boolean =
    if (!lines.hasNext) false
    else { current = convert(mapper.readTree(lines.next())); true }

  private def pairs(node: JsonNode): ArrayData =
    if (node == null || node.isNull) null
    else new GenericArrayData(node.elements().asScala.map { pair =>
      new GenericArrayData(pair.elements().asScala.map(_.asDouble()).toArray[Any])
    }.toArray[Any])

  private def convert(node: JsonNode): InternalRow =
    InternalRow.fromSeq(required.fields.map { f =>
      (f.name, node.get(f.name)) match {
        case ("coin_id", v) => if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
        case (_, v) => pairs(v)
      }
    }.toSeq)

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
