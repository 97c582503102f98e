package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded-media record produced by [[Multimodal.decodePartitions]]. */
case class DecodedMedia(media_id: Long, kind: String, n_bytes: Int, checksum: Long)

/** Multimodal columns for LLM-training-data pipelines (driver
  * mandate): image/audio/video as opaque `binary` payload columns with
  * a typed metadata struct, plus the decode / feature-extract /
  * frame-sample plumbing.
  *
  * The decode KERNELS are deterministic fakes, clearly marked — the
  * container has no image/audio libraries, and the mandate is that the
  * Spark-side plumbing (schema, partitioning, batch shape) be real and
  * tested while the byte-level decode is stubbed. Swapping
  * [[FakeDecoder]] for a JNI/ImageIO decoder changes no plan shape.
  *
  * Scale posture: payloads never pass through a shuffle — every
  * operator here is a projection or a generator over the scan, and
  * [[decodePartitions]] amortizes decoder initialization per partition
  * (the JVM analog of `mapInPandas` batch decoding).
  */
object Multimodal {

  /** Wrap `documents` rows as media rows: payload = UTF-8 bytes of the
    * text (a stand-in corpus — a real one reads binary parquet
    * directly), kind assigned round-robin, metadata derived
    * deterministically (width/height for images, duration for a/v). */
  def fromDocuments(docs: DataFrame): DataFrame = {
    val kind = when(col("doc_id") % 3 === 0, lit("image"))
      .when(col("doc_id") % 3 === 1, lit("audio"))
      .otherwise(lit("video"))
    docs.select(
      col("doc_id").as("media_id"),
      kind.as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        octet_length(col("text")).as("n_bytes"),
        (col("n_chars") % 640 + 64).cast("int").as("width"),
        (col("n_chars") % 480 + 48).cast("int").as("height"),
        (col("n_chars") * 40).cast("long").as("duration_ms"),
        lit(16000).as("sample_rate")).as("meta"))
  }

  /** STUB feature extractor: a real system decodes the payload and
    * runs a vision/audio model; here the "features" are a
    * deterministic hash-derived vector in [0,1). The expression shape
    * (payload → fixed-dim array<float>, map-side, codegen'd) is
    * exactly what a real kernel plugs into. */
  def fakeFeatures(payload: Column, dim: Int = 16): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(payload, i), lit(1000L)).cast("double") / lit(1000.0)).cast("float"))

  /** STUB resize: a real kernel would re-encode the payload; the stub
    * rewrites the metadata (the part pipelines key off) and passes the
    * payload through. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta", col("meta")
      .withField("width", lit(w)).withField("height", lit(h)))

  /** Frame-sampling plumbing for video rows: one output row per
    * sampled offset — a generator over the scan (no shuffle), frame
    * content addressed by a deterministic digest of (payload, offset).
    * A real kernel would slice the container at the offset; the
    * digest stands in for the frame bytes. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("payload"),
        // zero-length media yields zero frames: an unguarded
        // sequence(0, -1) throws "Illegal sequence boundaries" at
        // runtime, and the oracle's range(0, 0, step) is empty.
        explode(when(col("meta.duration_ms") > 0,
            sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs)))
          .otherwise(array().cast("array<long>"))).as("offset_ms"))
      .select(col("media_id"), col("offset_ms"),
        sha2(concat(col("payload").cast("string"), lit("-"), col("offset_ms").cast("string")), 256)
          .as("frame_sha"))

  /** Partition-amortized decode (the JVM analog of `mapInPandas`):
    * the decoder is instantiated ONCE per partition and reused across
    * its rows — the pattern any native decoding library needs. */
  def decodePartitions(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new FakeDecoder // per-partition init, not per-row
        rows.map { case (id, kind, bytes) =>
          DecodedMedia(id, kind, bytes.length, decoder.checksum(bytes))
        }
      }
  }

  /** STUB decoder: stands in for an image/audio codec handle (which is
    * expensive to construct — hence the per-partition amortization). */
  final class FakeDecoder {
    def checksum(bytes: Array[Byte]): Long =
      bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
  }
}
