package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded-media record produced by [[Multimodal.decodePartitions]]. */
case class DecodedMedia(media_id: Long, kind: String, n_bytes: Int, checksum: Long)

/** Decoded-image statistics produced by the REAL byte-level
  * [[Multimodal.PixelDecoder]]: header-parsed dimensions, exact
  * integer per-channel pixel sums, and two positional probes —
  * the top-left red and bottom-right blue values, which detect a
  * decoder that mis-handles BMP's bottom-up row order or row padding
  * even when the sums happen to survive. */
case class DecodedImage(media_id: Long, fmt: String, width: Int, height: Int,
                        n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long,
                        p00_r: Long, plast_b: Long)

/** Decoded-audio statistics produced by the REAL byte-level
  * [[Multimodal.WavDecoder]]: header-parsed channel count / sample
  * rate / frame count, exact integer per-channel sample sums, and two
  * positional probes — the first left-channel sample and the very
  * last sample in the data chunk — which catch a decoder that
  * mis-handles interleaving or chunk offsets even when sums survive. */
case class DecodedAudio(media_id: Long, fmt: String, n_channels: Int,
                        sample_rate: Int, n_frames: Long,
                        sum_l: Long, sum_r: Long, first_l: Long, last_s: Long)

/** Media feature vector produced by the REAL byte-level
  * [[Multimodal.FeatureExtractor]] — the modality-appropriate
  * fixed-dimension summary a training pipeline joins onto documents:
  * for images, a 4-bin red-channel intensity histogram (f0–f3) and
  * 2×2 spatial green-sum pooling (f4–f7, quadrant order TL,TR,BL,BR);
  * for audio, per-window energy (sum of squared samples) over 4 equal
  * time windows, left channel in f0–f3 and right in f4–f7 (mono rows
  * report zero right-channel energy). All-integer on purpose: the
  * cross-engine gate hashes exact values, no float tolerance. */
case class MediaFeatures(media_id: Long, kind: String,
                         f0: Long, f1: Long, f2: Long, f3: Long,
                         f4: Long, f5: Long, f6: Long, f7: Long)

/** Decoded-video statistics produced by the REAL byte-level
  * [[Multimodal.AviDecoder]]: container-parsed dimensions / frame
  * count / frame duration, exact integer per-channel pixel sums over
  * ALL frames, the middle frame's green sum obtained by SLICING the
  * container through its `idx1` index (random access, not the
  * sequential walk), and two positional probes — frame 0's top-left
  * red and the last frame's bottom-right blue — which catch a decoder
  * that mis-walks chunks, mis-handles the bottom-up DIB rows, or
  * builds a wrong index even when totals collide. */
case class DecodedVideo(media_id: Long, fmt: String, width: Int, height: Int,
                        n_frames: Long, us_per_frame: Int,
                        sum_r: Long, sum_g: Long, sum_b: Long,
                        mid_sum_g: Long, first_r: Long, last_b: Long)

/** Multimodal columns for LLM-training-data pipelines (driver
  * mandate): image/audio/video as opaque `binary` payload columns with
  * a typed metadata struct, plus the decode / feature-extract /
  * frame-sample plumbing.
  *
  * The IMAGE decode kernel is REAL byte-level parsing (round 8):
  * [[PixelDecoder]] sniffs the payload's magic bytes and decodes
  * uncompressed 24-bit BMP (little-endian header fields, 4-byte row
  * padding, bottom-up row order) and binary P6 PPM (ASCII header with
  * comment handling) down to per-pixel channel values, inside the
  * same per-partition-amortized mapPartitions shape
  * ([[decodeImages]]). The AUDIO kernel is real the same way
  * (round 9): [[WavDecoder]] walks a RIFF/WAVE chunk list (unknown
  * chunks skipped, odd sizes padded per the RIFF rule) and decodes
  * 16-bit PCM mono/stereo down to per-channel sample sums
  * ([[decodeAudio]]). The VIDEO kernel is real as of round 10:
  * [[AviDecoder]] walks a RIFF AVI container (hdrl/strl headers, JUNK
  * padding skipped with the pad rule, movi child chunks, idx1 index)
  * and decodes uncompressed 24-bit DIB frames, with middle-frame
  * SLICING through the index — random access, the real form of what
  * [[sampleFrames]]'s digest plumbing stands in for on arbitrary
  * codecs. As of round 11 the FEATURE and RESIZE kernels are real
  * too, computed entirely from these in-repo decoders (no codec
  * library): [[FeatureExtractor]] produces per-channel histograms /
  * 2×2 spatial pooling for images and per-window band energy for
  * audio, and [[resizeImages]] is a true nearest-neighbor re-encode
  * through [[PixelDecoder]]/[[encodeBmp]]. The only stand-in left is
  * [[sampleFrames]]'s frame digest on arbitrary codecs (its real AVI
  * form is [[AviDecoder]]'s idx1 slicing) and [[FakeDecoder]]'s
  * checksum plumbing demo.
  *
  * Scale posture: payloads never pass through a shuffle — every
  * operator here is a projection or a generator over the scan, and
  * the decode paths amortize decoder initialization per partition
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

  /** REAL feature extractor — one instance per partition (the
    * codec-handle amortization slot, like the decoders it wraps).
    * Sniffs the payload's magic bytes and computes the
    * modality-appropriate fixed-dimension summary entirely from the
    * in-repo byte-level decoders — no codec library:
    *
    *   - image (BMP/PPM via [[PixelDecoder.raster]]): f0–f3 = 4-bin
    *     red-channel intensity histogram (bin = r >> 6 — the color
    *     profile), f4–f7 = green-channel sums over the 2×2 spatial
    *     quadrants TL,TR,BL,BR (a pixel is right/bottom when
    *     2x >= w / 2y >= h — the patch pooling a vision embedding's
    *     first layer performs, in exact integer form);
    *   - audio (WAV via [[WavDecoder.pcm]]): per-window ENERGY — the
    *     sum of squared samples over 4 equal time windows (window of
    *     frame f = 4f / nFrames) — left channel in f0–f3, right in
    *     f4–f7 (zero for mono): the energy envelope that drives
    *     silence trimming and segmentation.
    *
    * All-integer so the cross-engine gate (q115) hashes exact values.
    * Malformed payloads throw the decoders' labeled quarantine
    * errors. */
  final class FeatureExtractor {
    private val images = new PixelDecoder
    private val audio = new WavDecoder
    private val video = new AviDecoder

    def extract(id: Long, bytes: Array[Byte]): MediaFeatures = {
      require(bytes.length >= 4, s"media $id: ${bytes.length}-byte payload")
      val f = new Array[Long](8)
      // RIFF covers BOTH modalities — the form type at bytes 8-11
      // routes WAVE to the audio kernel and 'AVI ' to the video one
      // (red/green frame sums over 4 temporal windows, the per-frame
      // analog of the audio per-window energy).
      if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
          bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' ') {
        val v = video.temporalFeatures(id, bytes)
        MediaFeatures(id, "video", v(0), v(1), v(2), v(3), v(4), v(5), v(6), v(7))
      } else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') {
        val p = audio.pcm(id, bytes)
        var fr = 0
        while (fr < p.nFrames) {
          val w = (fr.toLong * 4 / p.nFrames).toInt // 0..3, exact by fr < nFrames
          val l = p.sample(fr, 0).toLong
          f(w) += l * l
          if (p.nChannels == 2) { val r = p.sample(fr, 1).toLong; f(4 + w) += r * r }
          fr += 1
        }
        MediaFeatures(id, "audio", f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
      } else {
        val r = images.raster(id, bytes)
        var y = 0
        while (y < r.h) {
          val qy = if (2 * y >= r.h) 2 else 0
          var x = 0
          while (x < r.w) {
            f(r.channel(x, y, 0) >> 6) += 1
            f(4 + qy + (if (2 * x >= r.w) 1 else 0)) += r.channel(x, y, 1)
            x += 1
          }
          y += 1
        }
        MediaFeatures(id, "image", f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
      }
    }
  }

  /** Extract [[MediaFeatures]] from (media_id, payload) rows with the
    * REAL [[FeatureExtractor]] — per-partition extractor instance,
    * map-only, payloads never shuffle (the [[decodeImages]] shape). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val extractor = new FeatureExtractor // per-partition init, not per-row
        rows.map { case (id, bytes) => extractor.extract(id, bytes) }
      }
  }

  /** REAL nearest-neighbor image resize: decode the payload (BMP or
    * PPM) through [[PixelDecoder.raster]], sample the target grid —
    * source pixel of target (x, y) is (⌊x·w₀/w⌋, ⌊y·h₀/h⌋), the
    * classic NN rule — and re-encode as 24-bit BMP through
    * [[encodeBmp]]. No codec library: both ends are the in-repo
    * byte kernels. */
  def resizeImage(decoder: PixelDecoder, id: Long, bytes: Array[Byte],
                  w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"media $id: bad resize target ${w}x$h")
    val r = decoder.raster(id, bytes)
    encodeBmp(w, h, (x, y) => {
      val sx = (x.toLong * r.w / w).toInt
      val sy = (y.toLong * r.h / h).toInt
      (r.channel(sx, sy, 0), r.channel(sx, sy, 1), r.channel(sx, sy, 2))
    })
  }

  /** Resize (media_id, payload) image rows to `w`×`h` with the REAL
    * [[resizeImage]] kernel — per-partition decoder instance,
    * map-only, payloads never shuffle. Output payloads are always
    * BMP (PPM inputs are converted — the normalize-on-ingest a
    * training pipeline wants anyway). */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new PixelDecoder // per-partition init, not per-row
        rows.map { case (id, bytes) => (id, resizeImage(decoder, id, bytes, w, h)) }
      }
      .toDF("media_id", "payload")
  }

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

  // ------------------------------------------------------------------
  // REAL image codec: uncompressed 24-bit BMP + binary P6 PPM.
  // ------------------------------------------------------------------

  /** Encode a `w`×`h` image as an uncompressed 24-bit BMP
    * (BITMAPINFOHEADER): little-endian header fields, BGR byte order,
    * rows stored BOTTOM-UP and padded to 4-byte boundaries — the
    * format details [[PixelDecoder]] must get right. `px(x, y)` is
    * (r, g, b) at IMAGE coordinates (origin top-left). */
  def encodeBmp(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val stride = (w * 3 + 3) / 4 * 4
    val size = 54 + stride * h
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h) // positive height = bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(stride * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) { // bottom row first
      var x = 0
      while (x < w) {
        val (r, g, bl) = px(x, y)
        b.put(bl.toByte).put(g.toByte).put(r.toByte) // BGR
        x += 1
      }
      var pad = stride - w * 3
      while (pad > 0) { b.put(0: Byte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** Encode as binary P6 PPM: ASCII `P6\n<w> <h>\n255\n` header (plus
    * a comment line, so decoders must handle them) then top-down RGB
    * triples. */
  def encodePpm(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val header = s"P6\n# graft test image\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        out(i) = r.toByte; out(i + 1) = g.toByte; out(i + 2) = b.toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Parsed raster accessor over a validated in-memory image payload:
    * `channel(x, y, ch)` reads channel `ch` (0=r, 1=g, 2=b) at IMAGE
    * coordinates (origin top-left), absorbing the format's storage
    * quirks — BMP's BGR byte order, bottom-up rows and 4-byte row
    * stride vs PPM's plain top-down RGB — so every consumer
    * ([[PixelDecoder.decode]] stats, [[FeatureExtractor]] pooling,
    * [[resizeImages]] sampling) shares ONE definition of "the pixel
    * at (x, y)" instead of three copies of the layout math. Bounds
    * were fully validated by the parse that produced this object. */
  final class Raster(val fmt: String, val w: Int, val h: Int,
                     b: Array[Byte], off: Int, stride: Int,
                     bottomUp: Boolean, rgbOrder: Boolean) {
    def channel(x: Int, y: Int, ch: Int): Int = {
      val p = off + (if (bottomUp) h - 1 - y else y) * stride + x * 3
      if (rgbOrder) b(p + ch) & 0xff else b(p + (2 - ch)) & 0xff
    }
  }

  /** REAL byte-level image decoder — one instance per partition (the
    * codec-handle amortization slot). Sniffs the magic bytes and
    * parses uncompressed 24-bit BMP or binary P6 PPM down to pixels:
    * exact integer channel sums plus the (0,0) red / (w−1,h−1) blue
    * probes in IMAGE coordinates, so a decoder that ignores BMP's
    * bottom-up storage or row padding is caught positionally.
    * Malformed payloads throw with the offending detail — a training
    * pipeline quarantines those rows rather than averaging garbage.
    * The parse is exposed as [[raster]] so the feature and resize
    * kernels reuse the identical validation + layout math. */
  final class PixelDecoder {
    def decode(id: Long, bytes: Array[Byte]): DecodedImage = {
      val r = raster(id, bytes)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < r.h) {
        var x = 0
        while (x < r.w) {
          sr += r.channel(x, y, 0); sg += r.channel(x, y, 1); sb += r.channel(x, y, 2)
          x += 1
        }
        y += 1
      }
      DecodedImage(id, r.fmt, r.w, r.h, r.w.toLong * r.h, sr, sg, sb,
        r.channel(0, 0, 0), r.channel(r.w - 1, r.h - 1, 2))
    }

    /** Parse + validate a BMP/PPM payload to a [[Raster]] accessor. */
    def raster(id: Long, bytes: Array[Byte]): Raster = {
      require(bytes.length >= 2, s"media $id: ${bytes.length}-byte payload")
      if (bytes(0) == 'B' && bytes(1) == 'M') parseBmp(id, bytes)
      else if (bytes(0) == 'P' && bytes(1) == '6') parsePpm(id, bytes)
      else throw new IllegalArgumentException(
        s"media $id: unknown magic ${bytes(0)},${bytes(1)}")
    }

    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | (b(i + 1) & 0xff) << 8 | (b(i + 2) & 0xff) << 16 | (b(i + 3) & 0xff) << 24
    private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | (b(i + 1) & 0xff) << 8

    private def parseBmp(id: Long, b: Array[Byte]): Raster = {
      require(b.length >= 54, s"media $id: truncated BMP header (${b.length} bytes)")
      val off = le32(b, 10)
      val w = le32(b, 18)
      val hRaw = le32(b, 22)
      val bottomUp = hRaw > 0 // negative height = top-down variant
      val h = math.abs(hRaw)
      require(le16(b, 28) == 24, s"media $id: bpp ${le16(b, 28)}, only 24-bit supported")
      require(le32(b, 30) == 0, s"media $id: compressed BMP (method ${le32(b, 30)})")
      // Long arithmetic throughout the bound: crafted headers with huge
      // w/h must fail THIS require loudly, not overflow the int product
      // and surface later as an ArrayIndexOutOfBoundsException; and
      // w=0/h=0 must not skip the pixel loops yet still "succeed" by
      // reading probe bytes out of the header.
      require(w > 0 && h > 0 && off >= 54,
        s"media $id: implausible BMP geometry w=$w h=$h off=$off")
      val strideL = (w.toLong * 3 + 3) / 4 * 4
      require(off.toLong + strideL * h <= b.length,
        s"media $id: truncated BMP pixel array")
      new Raster("bmp", w, h, b, off, strideL.toInt, bottomUp, rgbOrder = false)
    }

    private def parsePpm(id: Long, b: Array[Byte]): Raster = {
      // ASCII header: P6, then 3 whitespace-separated ints (w, h,
      // maxval), '#' comments running to end-of-line, ONE whitespace
      // byte after maxval, then binary RGB top-down.
      var i = 2
      def token(): Int = {
        while (i < b.length && (b(i).toChar.isWhitespace || b(i) == '#'))
          if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
          else i += 1
        var v = 0
        require(i < b.length && b(i) >= '0' && b(i) <= '9',
          s"media $id: malformed PPM header at byte $i")
        while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1 }
        v
      }
      val w = token(); val h = token(); val maxv = token()
      require(maxv == 255, s"media $id: PPM maxval $maxv, only 8-bit supported")
      i += 1 // the single whitespace after maxval
      // Same hardening as parseBmp: zero/huge dims must fail here, in
      // long arithmetic, not read probes out of the header or overflow.
      require(w > 0 && h > 0 && i.toLong + w.toLong * h * 3 <= b.length,
        s"media $id: truncated PPM pixel data (w=$w h=$h)")
      new Raster("ppm", w, h, b, i, w * 3, bottomUp = false, rgbOrder = true)
    }
  }

  /** Decode a (media_id, payload) frame with the REAL [[PixelDecoder]]
    * — per-partition decoder instance, map-only, payloads never
    * shuffle. */
  def decodeImages(media: DataFrame): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new PixelDecoder // per-partition init, not per-row
        rows.map { case (id, bytes) => decoder.decode(id, bytes) }
      }
  }

  // ------------------------------------------------------------------
  // REAL audio codec: RIFF/WAVE, 16-bit PCM, mono/stereo.
  // ------------------------------------------------------------------

  /** Encode 16-bit PCM as a canonical RIFF/WAVE file: `RIFF` size
    * `WAVE`, a 16-byte `fmt ` chunk (format 1 = PCM, little-endian
    * throughout), then the `data` chunk of interleaved frames
    * (channel-major within a frame: L then R). `sample(frame, ch)`
    * must fit a signed 16-bit value. With `withListChunk`, an odd-
    * sized `LIST` metadata chunk is inserted BETWEEN `fmt ` and
    * `data` — decoders must walk the chunk list and apply RIFF's
    * odd-size pad rule to find the data, the audio analog of PPM's
    * comment line. */
  def encodeWav(nChannels: Int, sampleRate: Int, nFrames: Int,
                sample: (Int, Int) => Int,
                withListChunk: Boolean = false): Array[Byte] = {
    require(nChannels == 1 || nChannels == 2, s"bad channel count $nChannels")
    require(sampleRate > 0 && nFrames > 0, s"bad rate/frames $sampleRate/$nFrames")
    val list = if (withListChunk) "INFOgraft".getBytes("US-ASCII") else Array.empty[Byte]
    val listPadded = list.length + (list.length & 1) // RIFF pads odd chunks
    val listBytes = if (withListChunk) 8 + listPadded else 0
    val dataBytes = nFrames * nChannels * 2
    val size = 12 + 24 + listBytes + 8 + dataBytes
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(size - 8).put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(nChannels.toShort).putInt(sampleRate)
      .putInt(sampleRate * nChannels * 2).putShort((nChannels * 2).toShort).putShort(16)
    if (withListChunk) {
      b.put("LIST".getBytes("US-ASCII")).putInt(list.length).put(list)
      if ((list.length & 1) == 1) b.put(0: Byte) // pad byte, not counted in size
    }
    b.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < nChannels) { b.putShort(sample(f, c).toShort); c += 1 }
      f += 1
    }
    b.array()
  }

  /** REAL byte-level WAV decoder — one instance per partition (the
    * codec-handle amortization slot, like [[PixelDecoder]]). Walks the
    * RIFF chunk list (skipping unknown chunks, honoring the odd-size
    * pad rule), validates the PCM `fmt ` chunk, then decodes the
    * interleaved 16-bit frames to exact per-channel sums and two
    * positional probes: the first left sample and the LAST sample of
    * the data chunk (last frame, last channel) — a decoder that
    * mis-walks chunks or de-interleaves wrongly is caught positionally
    * even when totals collide. Mono rows report `sum_r = 0`.
    * Malformed payloads throw with the offending detail, long
    * arithmetic guarding every bound (the q99 hardening posture). */
  /** Parsed PCM accessor over a validated in-memory WAV payload:
    * `sample(f, c)` is the sign-extended 16-bit sample of frame `f`,
    * channel `c` (0=left, 1=right), absorbing the interleaved frame
    * layout — so [[WavDecoder.decode]]'s stats and
    * [[FeatureExtractor]]'s band energies share ONE definition of
    * "sample (f, c)". Bounds were fully validated by the parse. */
  final class Pcm(val nChannels: Int, val sampleRate: Int, val nFrames: Int,
                  b: Array[Byte], dataOff: Int) {
    def sample(f: Int, c: Int): Int = {
      val p = dataOff + (f * nChannels + c) * 2
      ((b(p) & 0xff) | (b(p + 1) & 0xff) << 8).toShort.toInt // sign-extend
    }
  }

  final class WavDecoder {
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | (b(i + 1) & 0xff) << 8 | (b(i + 2) & 0xff) << 16 | (b(i + 3) & 0xff) << 24
    private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | (b(i + 1) & 0xff) << 8
    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, "US-ASCII")

    def decode(id: Long, b: Array[Byte]): DecodedAudio = {
      val p = pcm(id, b)
      var (sl, sr) = (0L, 0L)
      var f = 0
      while (f < p.nFrames) {
        sl += p.sample(f, 0).toLong
        if (p.nChannels == 2) sr += p.sample(f, 1).toLong
        f += 1
      }
      val firstL = p.sample(0, 0).toLong
      val lastS = p.sample(p.nFrames - 1, p.nChannels - 1).toLong
      DecodedAudio(id, "wav", p.nChannels, p.sampleRate, p.nFrames.toLong,
        sl, sr, firstL, lastS)
    }

    /** Parse + validate a RIFF/WAVE payload to a [[Pcm]] accessor. */
    def pcm(id: Long, b: Array[Byte]): Pcm = {
      require(b.length >= 44, s"media $id: ${b.length}-byte payload, shorter than any WAV")
      require(tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
        s"media $id: not RIFF/WAVE (${tag(b, 0)}/${tag(b, 8)})")
      // Walk the chunk list: fmt must precede data (the spec's rule);
      // unknown chunks (LIST, cue , …) are skipped with the pad rule.
      var i = 12
      var nCh = -1; var rate = -1; var dataOff = -1; var dataLen = -1
      while (i + 8 <= b.length && dataOff < 0) {
        val ct = tag(b, i); val cs = le32(b, i + 4)
        require(cs >= 0 && i + 8 + cs.toLong <= b.length,
          s"media $id: chunk $ct size $cs overruns payload at byte $i")
        if (ct == "fmt ") {
          require(cs >= 16, s"media $id: fmt chunk only $cs bytes")
          require(le16(b, i + 8) == 1, s"media $id: format ${le16(b, i + 8)}, only PCM supported")
          nCh = le16(b, i + 10); rate = le32(b, i + 12)
          require(nCh == 1 || nCh == 2, s"media $id: $nCh channels, only mono/stereo")
          require(le16(b, i + 22) == 16, s"media $id: ${le16(b, i + 22)}-bit, only 16-bit PCM")
        } else if (ct == "data") {
          require(nCh > 0, s"media $id: data chunk before fmt")
          dataOff = i + 8; dataLen = cs
        }
        i += 8 + cs + (cs & 1) // RIFF odd-size pad
      }
      require(dataOff >= 0, s"media $id: no data chunk found")
      val blockAlign = nCh * 2
      require(dataLen % blockAlign == 0,
        s"media $id: data length $dataLen not a multiple of frame size $blockAlign")
      val nFrames = dataLen / blockAlign
      require(nFrames > 0, s"media $id: empty data chunk")
      new Pcm(nCh, rate, nFrames, b, dataOff)
    }
  }

  /** Decode (media_id, payload) WAV rows with the REAL [[WavDecoder]]
    * — per-partition decoder instance, map-only, payloads never
    * shuffle (the [[decodeImages]] shape for the audio modality). */
  def decodeAudio(media: DataFrame): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new WavDecoder // per-partition init, not per-row
        rows.map { case (id, bytes) => decoder.decode(id, bytes) }
      }
  }

  // ------------------------------------------------------------------
  // REAL video codec: RIFF AVI with uncompressed 24-bit DIB frames.
  // ------------------------------------------------------------------

  /** Encode `nFrames` frames of `w`×`h` uncompressed 24-bit video as a
    * canonical RIFF AVI: `LIST hdrl` (an `avih` main header + one
    * `LIST strl` video stream with `strh`/`strf`), `LIST movi` holding
    * one `00db` DIB chunk per frame (BGR, rows BOTTOM-UP, 4-byte row
    * stride — the BMP pixel layout without the BMP header), and an
    * `idx1` index whose offsets are relative to the first byte after
    * the `movi` fourcc (the standard convention) — the structure that
    * makes frame SLICING random-access. `px(frame, x, y)` is (r, g, b)
    * at IMAGE coordinates (origin top-left). With `withJunk`, an
    * odd-sized `JUNK` padding chunk (ubiquitous in real AVIs) sits
    * between `hdrl` and `movi` — decoders must skip it with RIFF's
    * odd-size pad rule. */
  def encodeAvi(w: Int, h: Int, nFrames: Int, usPerFrame: Int,
                px: (Int, Int, Int) => (Int, Int, Int),
                withJunk: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0 && usPerFrame > 0,
      s"bad avi spec ${w}x$h x$nFrames @$usPerFrame")
    val stride = (w * 3 + 3) / 4 * 4
    val frameBytes = stride * h
    val framePad = frameBytes & 1 // stride is 4-aligned so 0, kept for form
    val junk = if (withJunk) "GRAFTPAD1".getBytes("US-ASCII") else Array.empty[Byte]
    val junkBytes = if (withJunk) 8 + junk.length + (junk.length & 1) else 0
    val strlSize = 4 + 8 + 56 + 8 + 40              // 'strl' + strh + strf
    val hdrlSize = 4 + 8 + 56 + 8 + strlSize        // 'hdrl' + avih + LIST strl
    val moviSize = 4 + nFrames * (8 + frameBytes + framePad)
    val idx1Size = 16 * nFrames
    val riffSize = 4 + 8 + hdrlSize + junkBytes + 8 + moviSize + 8 + idx1Size
    val b = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); b.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); b.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); b.putInt(56)
    b.putInt(usPerFrame).putInt(0).putInt(0).putInt(0x10 /* AVIF_HASINDEX */)
      .putInt(nFrames).putInt(0).putInt(1).putInt(frameBytes)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); b.putInt(strlSize); fourcc("strl")
    fourcc("strh"); b.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    b.putInt(0).putInt(0).putInt(0)
      .putInt(usPerFrame).putInt(1000000) // dwScale/dwRate: rate/scale = fps
      .putInt(0).putInt(nFrames).putInt(frameBytes).putInt(-1).putInt(0)
    b.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
    fourcc("strf"); b.putInt(40)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
    if (withJunk) {
      fourcc("JUNK"); b.putInt(junk.length); b.put(junk)
      if ((junk.length & 1) == 1) b.put(0: Byte)
    }
    fourcc("LIST"); b.putInt(moviSize); fourcc("movi")
    val offsets = new Array[Int](nFrames)
    var base = 4 // offset of the next chunk relative to after 'movi'
    var f = 0
    while (f < nFrames) {
      offsets(f) = base
      fourcc("00db"); b.putInt(frameBytes)
      var row = h - 1 // bottom-up
      while (row >= 0) {
        var x = 0
        while (x < w) {
          val (r, g, bl) = px(f, x, row)
          b.put(bl.toByte).put(g.toByte).put(r.toByte)
          x += 1
        }
        var padI = w * 3
        while (padI < stride) { b.put(0: Byte); padI += 1 }
        row -= 1
      }
      if (framePad == 1) b.put(0: Byte)
      base += 8 + frameBytes + framePad
      f += 1
    }
    fourcc("idx1"); b.putInt(idx1Size)
    f = 0
    while (f < nFrames) {
      fourcc("00db"); b.putInt(0x10 /* AVIIF_KEYFRAME */)
      b.putInt(offsets(f)).putInt(frameBytes)
      f += 1
    }
    b.array()
  }

  /** REAL byte-level AVI decoder — one instance per partition (the
    * codec-handle amortization slot). Walks the outer RIFF chunk list
    * (JUNK and unknown chunks skipped with the odd-size pad rule),
    * parses `avih`/`strh`/`strf` for dimensions, frame count, frame
    * duration and the DIB format, then decodes every `00db` frame in
    * the `movi` list (BGR bottom-up, 4-byte stride) to exact channel
    * sums — and separately SLICES the middle frame through the `idx1`
    * index, validating random access against the sequential walk.
    * Malformed payloads throw with the offending detail, long
    * arithmetic guarding every bound (the q99/q107 hardening
    * posture). */
  final class AviDecoder {
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | (b(i + 1) & 0xff) << 8 | (b(i + 2) & 0xff) << 16 | (b(i + 3) & 0xff) << 24
    private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | (b(i + 1) & 0xff) << 8
    private def tag(b: Array[Byte], i: Int): String = new String(b, i, 4, "US-ASCII")

    /** (r, g, b) sums of ONE DIB frame starting at `off`. */
    private def frameSums(b: Array[Byte], off: Int, w: Int, h: Int): (Long, Long, Long) = {
      val stride = (w * 3 + 3) / 4 * 4
      var (sr, sg, sb) = (0L, 0L, 0L)
      var row = 0
      while (row < h) {
        val rowOff = off + (h - 1 - row).toLong * stride // bottom-up
        var x = 0
        while (x < w) {
          val p = (rowOff + x * 3).toInt
          sb += (b(p) & 0xff); sg += (b(p + 1) & 0xff); sr += (b(p + 2) & 0xff)
          x += 1
        }
        row += 1
      }
      (sr, sg, sb)
    }

    /** Parsed container geometry shared by [[decode]] and
      * [[temporalFeatures]] — (w, h, nFrames, usPerFrame, moviOff,
      * moviEnd, idxOff), every header/idx1 invariant checked with the
      * labeled quarantine errors. */
    private def parseHeader(id: Long, b: Array[Byte]): (Int, Int, Int, Int, Int, Int, Int) = {
      require(b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "AVI ",
        s"media $id: not a RIFF AVI")
      var i = 12
      var w = -1; var h = -1; var nFrames = -1; var usPerFrame = -1
      var moviOff = -1; var moviEnd = -1; var idxOff = -1; var idxLen = -1
      while (i + 8 <= b.length) {
        val ct = tag(b, i); val cs = le32(b, i + 4)
        require(cs >= 0 && i + 8 + cs.toLong <= b.length,
          s"media $id: chunk $ct size $cs overruns payload at byte $i")
        if (ct == "LIST") {
          // the list-type fourcc lives INSIDE the declared size: a
          // truncated LIST (cs < 4) must fail here with the labeled
          // quarantine error, not let tag(b, i+8) read past the chunk
          // (or, at end-of-payload, past the array).
          require(cs >= 4, s"media $id: LIST chunk size $cs too small for a list type at byte $i")
          val lt = tag(b, i + 8)
          if (lt == "hdrl") {
            // avih is the first child chunk of hdrl (spec-mandated);
            // bound its 8-byte header before reading tag/size.
            val a = i + 12
            require(a + 8 <= b.length,
              s"media $id: hdrl too short to hold an avih header")
            val avihSize = le32(b, a + 4)
            require(tag(b, a) == "avih" && avihSize >= 56 &&
              a + 8 + avihSize.toLong <= b.length,
              s"media $id: hdrl does not lead with a >=56-byte avih")
            usPerFrame = le32(b, a + 8)
            nFrames = le32(b, a + 24)
            w = le32(b, a + 40); h = le32(b, a + 44)
            require(w > 0 && h > 0 && nFrames > 0 && usPerFrame > 0,
              s"media $id: degenerate avih ${w}x$h x$nFrames @$usPerFrame")
            // the stream headers must declare uncompressed 24-bit DIB;
            // skip avih by its DECLARED size (spec-legal >56-byte
            // variants), honoring the pad rule
            val sl = a + 8 + avihSize + (avihSize & 1)
            require(sl + 24 <= b.length &&
              tag(b, sl) == "LIST" && tag(b, sl + 8) == "strl" &&
              tag(b, sl + 12) == "strh" && tag(b, sl + 20) == "vids",
              s"media $id: missing vids stream header")
            val sf = sl + 20 + 56
            require(sf + 24 <= b.length &&
              tag(b, sf) == "strf" && le16(b, sf + 22) == 24,
              s"media $id: stream format is not 24-bit DIB")
          } else if (lt == "movi") {
            require(w > 0, s"media $id: movi before hdrl")
            moviOff = i + 12; moviEnd = i + 8 + cs
          }
        } else if (ct == "idx1") { idxOff = i + 8; idxLen = cs }
        i += 8 + cs + (cs & 1) // RIFF odd-size pad
      }
      require(moviOff >= 0, s"media $id: no movi list")
      require(idxOff >= 0 && idxLen == 16 * nFrames,
        s"media $id: idx1 missing or ${idxLen}B for $nFrames frames")
      (w, h, nFrames, usPerFrame, moviOff, moviEnd, idxOff)
    }

    /** Temporal video features for [[FeatureExtractor]]: frame-level
      * red sums bucketed into 4 equal temporal windows (f0–f3) and
      * the same for green (f4–f7) — the per-frame analog of the audio
      * kernel's per-window energy, computed in the same sequential
      * movi walk [[decode]] validates. */
    def temporalFeatures(id: Long, b: Array[Byte]): Array[Long] = {
      val (w, h, nFrames, _, moviOff, moviEnd, _) = parseHeader(id, b)
      val stride = (w * 3 + 3) / 4 * 4
      val frameBytes = stride * h
      val f = new Array[Long](8)
      var seen = 0
      var j = moviOff
      while (j + 8 <= moviEnd) {
        val ft = tag(b, j); val fs = le32(b, j + 4)
        require(ft == "00db" && fs == frameBytes,
          s"media $id: movi chunk $ft/$fs != 00db/$frameBytes at byte $j")
        val win = seen * 4 / nFrames
        val (r, g, _) = frameSums(b, j + 8, w, h)
        f(win) += r; f(4 + win) += g
        seen += 1
        j += 8 + fs + (fs & 1)
      }
      require(seen == nFrames, s"media $id: movi holds $seen frames, avih says $nFrames")
      f
    }

    /** KEYFRAME SELECTION by frame-difference energy — the shot-cut
      * heuristic a video-curation pipeline samples training frames
      * with: delta(f) = Σ_pixels Σ_channels |c_f − c_{f−1}| for
      * f ≥ 1 (frame 0 has no predecessor), and the keyframes are the
      * top-`k` frames by (delta DESC, frame ASC — the deterministic
      * tiebreak). Padding bytes inside the DIB stride are SKIPPED —
      * they are encoder noise, not pixels. Returns (nFrames,
      * totalDelta, keyframe indices, their deltas), padded with
      * -1/-1 when fewer than `k` candidate frames exist. Same
      * validated movi walk as [[decode]]/[[resize]]. */
    def keyframes(id: Long, b: Array[Byte], k: Int): (Int, Long, Array[Int], Array[Long]) = {
      require(k >= 1, s"media $id: keyframes k must be >= 1")
      val (w, h, nFrames, _, moviOff, moviEnd, _) = parseHeader(id, b)
      val stride = (w * 3 + 3) / 4 * 4
      val frameBytes = stride * h
      val offs = new Array[Int](nFrames)
      var seen = 0
      var j = moviOff
      while (j + 8 <= moviEnd) {
        val ft = tag(b, j); val fs = le32(b, j + 4)
        require(ft == "00db" && fs == frameBytes,
          s"media $id: movi chunk $ft/$fs != 00db/$frameBytes at byte $j")
        require(seen < nFrames,
          s"media $id: movi holds more frames than avih's $nFrames")
        offs(seen) = j + 8; seen += 1
        j += 8 + fs + (fs & 1)
      }
      require(seen == nFrames, s"media $id: movi holds $seen frames, avih says $nFrames")
      val deltas = new Array[Long](nFrames) // index 0 stays 0 (no predecessor)
      var f = 1
      while (f < nFrames) {
        val a = offs(f - 1); val c = offs(f)
        var d = 0L
        var row = 0
        while (row < h) {
          val ra = a + row * stride; val rc = c + row * stride
          var i = 0
          val rowBytes = w * 3 // stop before the stride padding
          while (i < rowBytes) {
            d += math.abs((b(rc + i) & 0xff) - (b(ra + i) & 0xff))
            i += 1
          }
          row += 1
        }
        deltas(f) = d
        f += 1
      }
      val ranked = (1 until nFrames).sortBy(i => (-deltas(i), i))
      val top = ranked.take(k)
      val idx = Array.fill(k)(-1)
      val dv = Array.fill(k)(-1L)
      top.zipWithIndex.foreach { case (fi, r) => idx(r) = fi; dv(r) = deltas(fi) }
      (nFrames, deltas.sum, idx, dv)
    }

    /** REAL nearest-neighbor VIDEO resize: the validated movi walk
      * collects every source frame's data offset, each target frame
      * samples its source at (⌊x·w₀/w⌋, ⌊y·h₀/h⌋) — [[resizeImage]]'s
      * NN rule applied per frame — and the result re-encodes as a
      * COMPLETE AVI (avih/strl headers, movi, idx1) at the new
      * geometry with frame count and timing preserved. No codec
      * library: decoder and encoder are both in-repo byte kernels. */
    def resize(id: Long, b: Array[Byte], newW: Int, newH: Int): Array[Byte] = {
      require(newW > 0 && newH > 0, s"media $id: bad resize target ${newW}x$newH")
      val (w, h, nFrames, usPerFrame, moviOff, moviEnd, _) = parseHeader(id, b)
      val stride = (w * 3 + 3) / 4 * 4
      val frameBytes = stride * h
      val offs = new Array[Int](nFrames)
      var seen = 0
      var j = moviOff
      while (j + 8 <= moviEnd) {
        val ft = tag(b, j); val fs = le32(b, j + 4)
        require(ft == "00db" && fs == frameBytes,
          s"media $id: movi chunk $ft/$fs != 00db/$frameBytes at byte $j")
        require(seen < nFrames,
          s"media $id: movi holds more frames than avih's $nFrames")
        offs(seen) = j + 8; seen += 1
        j += 8 + fs + (fs & 1)
      }
      require(seen == nFrames, s"media $id: movi holds $seen frames, avih says $nFrames")
      encodeAvi(newW, newH, nFrames, usPerFrame, (f, x, y) => {
        val sx = (x.toLong * w / newW).toInt
        val sy = (y.toLong * h / newH).toInt
        val p = offs(f) + (h - 1 - sy) * stride + sx * 3 // bottom-up source row
        ((b(p + 2) & 0xff), (b(p + 1) & 0xff), (b(p) & 0xff))
      })
    }

    def decode(id: Long, b: Array[Byte]): DecodedVideo = {
      val (w, h, nFrames, usPerFrame, moviOff, moviEnd, idxOff) = parseHeader(id, b)
      val stride = (w * 3 + 3) / 4 * 4
      val frameBytes = stride * h
      // Sequential walk of the movi children.
      var (sr, sg, sb) = (0L, 0L, 0L)
      var seen = 0
      var j = moviOff
      while (j + 8 <= moviEnd) {
        val ft = tag(b, j); val fs = le32(b, j + 4)
        require(ft == "00db" && fs == frameBytes,
          s"media $id: movi chunk $ft/$fs != 00db/$frameBytes at byte $j")
        val (r, g, bl) = frameSums(b, j + 8, w, h)
        sr += r; sg += g; sb += bl
        seen += 1
        j += 8 + fs + (fs & 1)
      }
      require(seen == nFrames, s"media $id: movi holds $seen frames, avih says $nFrames")
      // Random-access SLICE through idx1: offsets are relative to the
      // first byte after the 'movi' fourcc. EVERY index-derived
      // dereference is bounds- and tag-checked BEFORE use — a corrupt
      // offset must throw the labeled quarantine error, never return a
      // silently-wrong probe or an unlabeled array exception.
      def frameDataAt(entry: Int, what: String): Int = {
        val e = idxOff + 16 * entry
        require(tag(b, e) == "00db", s"media $id: idx1[$what] tags ${tag(b, e)}")
        val off = le32(b, e + 8)
        val pos = moviOff.toLong - 4 + off
        require(off >= 0 && pos >= 0 && pos + 8 + frameBytes <= b.length,
          s"media $id: idx1[$what] offset $off out of bounds")
        val p = pos.toInt
        require(tag(b, p) == "00db" && le32(b, p + 4) == frameBytes,
          s"media $id: idx1[$what] offset $off does not land on a frame chunk")
        p + 8
      }
      val mid = nFrames / 2
      val (_, midG, _) = frameSums(b, frameDataAt(mid, s"mid=$mid"), w, h)
      // Positional probes: frame 0 top-left red, last frame
      // bottom-right blue — catch bottom-up/stride mistakes that
      // cancel in the sums.
      val f0 = moviOff + 8 // first movi child is frame 0; +8 skips its header
      val firstR = (b(f0 + (h - 1) * stride + 2) & 0xff).toLong
      val lastOff = frameDataAt(nFrames - 1, s"last=${nFrames - 1}")
      val lastB = (b(lastOff + (w - 1) * 3) & 0xff).toLong
      DecodedVideo(id, "avi", w, h, nFrames.toLong, usPerFrame,
        sr, sg, sb, midG, firstR, lastB)
    }
  }

  /** Decode (media_id, payload) AVI rows with the REAL [[AviDecoder]]
    * — per-partition decoder instance, map-only, payloads never
    * shuffle (the [[decodeImages]]/[[decodeAudio]] shape for the
    * video modality). */
  def decodeVideos(media: DataFrame): Dataset[DecodedVideo] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new AviDecoder // per-partition init, not per-row
        rows.map { case (id, bytes) => decoder.decode(id, bytes) }
      }
  }

  /** PERCEPTUAL IMAGE HASH (dHash) for (media_id, payload) image
    * rows — the visual analog of SimHash: the raster is NN-resampled
    * to a 9×8 luma grid (luma = r+g+b, integer), and bit (x, y) says
    * whether brightness RISES left-to-right at that cell
    * (lum[x+1] > lum[x]) — 64 gradient-direction bits that survive
    * re-encoding, format changes and small edits, which is exactly
    * what byte-level exact dedup cannot see. Returned as two 32-bit
    * halves (`h_hi`, `h_lo` — nonnegative longs, so XOR/bit_count
    * replay in any engine without sign traps). Per-partition
    * [[PixelDecoder]] kernel; payloads never shuffle. */
  def dHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new PixelDecoder // per-partition init, not per-row
        rows.map { case (id, bytes) =>
          val r = decoder.raster(id, bytes)
          val lum = Array.ofDim[Int](8, 9)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 9) {
              val sx = x * r.w / 9
              val sy = y * r.h / 8
              lum(y)(x) = r.channel(sx, sy, 0) + r.channel(sx, sy, 1) +
                r.channel(sx, sy, 2)
              x += 1
            }
            y += 1
          }
          var hi = 0L; var lo = 0L
          var bit = 0
          y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              if (lum(y)(x + 1) > lum(y)(x)) {
                if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
              }
              bit += 1
              x += 1
            }
            y += 1
          }
          (id, hi, lo)
        }
      }
      .toDF("media_id", "h_hi", "h_lo")
  }

  /** Near-duplicate IMAGE pairs by dHash hamming distance ≤
    * `maxHamming` — banded exact-match candidate generation, never
    * all-pairs: the 64 bits split into four 16-bit bands, and by
    * pigeonhole any pair within hamming 3 agrees EXACTLY on at least
    * one band (4 bands, ≤3 flipped bits), so a band-keyed equi-join
    * finds every qualifying pair and the exact popcount filter
    * discards the rest. The 100 TB shape: ids+bands shuffle, pixels
    * never do. */
  def nearDupImages(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    nearDupByHash(hashes, maxHamming)

  /** The banded pair search behind [[nearDupImages]] — generic over
    * ANY (media_id, h_hi, h_lo) 64-bit perceptual hash frame
    * ([[dHashes]], [[audioFingerprints]]). */
  def nearDupByHash(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"nearDupByHash: 4-band pigeonhole covers hamming <= 3, got $maxHamming")
    val banded = hashes.select(col("media_id"), col("h_hi"), col("h_lo"),
      posexplode(array(
        pmod(col("h_lo"), lit(65536L)),
        (col("h_lo") / 65536L).cast("long"),
        pmod(col("h_hi"), lit(65536L)),
        (col("h_hi") / 65536L).cast("long")))
        .as(Seq("band_idx", "band_val")))
    val a = banded.select(col("media_id").as("id_a"), col("h_hi").as("__ha"),
      col("h_lo").as("__la"), col("band_idx"), col("band_val"))
    val b = banded.select(col("media_id").as("id_b"), col("h_hi").as("__hb"),
      col("h_lo").as("__lb"), col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (bit_count(col("__ha").bitwiseXOR(col("__hb"))) +
          bit_count(col("__la").bitwiseXOR(col("__lb")))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // a pair agreeing on several bands collapses to one row
  }

  /** AUDIO FINGERPRINT for (media_id, payload) WAV rows — the
    * temporal analog of [[dHashes]] (chromaprint's core idea reduced
    * to its deterministic skeleton): the clip is cut into 65
    * EQUAL-COUNT windows (window i covers frames [i·F/65, (i+1)·F/65)
    * — length-normalizing, so re-sampled copies of one recording
    * still align), each window's energy is Σ sample² over frames and
    * channels, and bit i says whether energy RISES window-to-window
    * (e[i+1] > e[i]) — 64 loudness-envelope-direction bits robust to
    * gain changes in the same way dHash is robust to brightness.
    * Same (media_id, h_hi, h_lo) shape, so [[nearDupByHash]] finds
    * near-dup audio pairs with the identical banded join.
    * Per-partition [[WavDecoder]] kernel; payloads never shuffle. */
  def audioFingerprints(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new WavDecoder // per-partition init, not per-row
        rows.map { case (id, bytes) =>
          val p = decoder.pcm(id, bytes)
          val e = new Array[Long](65)
          var w = 0
          while (w < 65) {
            var f = (w.toLong * p.nFrames / 65).toInt
            val end = ((w + 1).toLong * p.nFrames / 65).toInt
            var acc = 0L
            while (f < end) {
              var c = 0
              while (c < p.nChannels) {
                val s = p.sample(f, c).toLong
                acc += s * s
                c += 1
              }
              f += 1
            }
            e(w) = acc
            w += 1
          }
          var hi = 0L; var lo = 0L
          var bit = 0
          while (bit < 64) {
            if (e(bit + 1) > e(bit)) {
              if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
            }
            bit += 1
          }
          (id, hi, lo)
        }
      }
      .toDF("media_id", "h_hi", "h_lo")
  }

  /** SILENCE SEGMENTATION for (media_id, payload) WAV rows — the
    * VAD-lite pass an audio-curation pipeline drops dead air with:
    * the PCM stream is cut into fixed `windowFrames` windows, a
    * window is SILENT when its energy (Σ over frames and channels of
    * sample²) is below `threshold`, and maximal runs of silent
    * windows are the segments. One row per clip: window count,
    * silent-window count, segment count, longest run, first silent
    * window (-1 when none). Per-partition [[WavDecoder]] kernel,
    * map-only, payloads never shuffle. */
  def silenceStats(media: DataFrame, windowFrames: Int,
                   threshold: Long): DataFrame = {
    require(windowFrames >= 1, s"silenceStats: windowFrames must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new WavDecoder // per-partition init, not per-row
        rows.map { case (id, bytes) =>
          val p = decoder.pcm(id, bytes)
          val nWin = (p.nFrames + windowFrames - 1) / windowFrames
          var silent = 0L; var segments = 0L; var longest = 0L
          var run = 0L; var firstSilent = -1L
          var w = 0
          while (w < nWin) {
            var e = 0L
            var f = w * windowFrames
            val end = math.min(f + windowFrames, p.nFrames)
            while (f < end) {
              var c = 0
              while (c < p.nChannels) {
                val s = p.sample(f, c).toLong
                e += s * s
                c += 1
              }
              f += 1
            }
            if (e < threshold) {
              silent += 1; run += 1
              if (run == 1L) segments += 1
              if (run > longest) longest = run
              if (firstSilent < 0L) firstSilent = w.toLong
            } else run = 0L
            w += 1
          }
          (id, nWin.toLong, silent, segments, longest, firstSilent)
        }
      }
      .toDF("media_id", "n_windows", "n_silent", "n_segments",
        "longest_run", "first_silent")
  }

  /** Keyframe statistics for (media_id, payload) AVI rows with the
    * REAL [[AviDecoder.keyframes]] kernel — per-partition decoder,
    * map-only, payloads never shuffle. One row per video:
    * (media_id, n_frames, total_delta, kf1, kf1_delta, kf2,
    * kf2_delta) with -1 sentinels when fewer candidates exist. */
  def keyframeStats(media: DataFrame, k: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new AviDecoder // per-partition init, not per-row
        rows.map { case (id, bytes) =>
          val (nf, total, idx, dv) = decoder.keyframes(id, bytes, k)
          (id, nf.toLong, total, idx(0), dv(0),
            if (k > 1) idx(1) else -1, if (k > 1) dv(1) else -1L)
        }
      }
      .toDF("media_id", "n_frames", "total_delta",
        "kf1", "kf1_delta", "kf2", "kf2_delta")
  }

  /** Resize (media_id, payload) AVI rows to `w`×`h` with the REAL
    * [[AviDecoder.resize]] kernel — per-partition decoder instance,
    * map-only, payloads never shuffle (the [[resizeImages]] shape for
    * the video modality). */
  def resizeVideos(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new AviDecoder // per-partition init, not per-row
        rows.map { case (id, bytes) => (id, decoder.resize(id, bytes, w, h)) }
      }
      .toDF("media_id", "payload")
  }
}
