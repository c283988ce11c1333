package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star scope): image/audio/video as
  * opaque `binary` payload columns + typed metadata, with decode /
  * feature-extract / resize / frame-sample as per-partition batched
  * operators over `Dataset[MediaAsset]`.
  *
  * Codec tiers: `FakeCodec` is the deterministic pure-arithmetic
  * stand-in (oracle-replayable); `ImageIoCodec` (JDK `javax.imageio`)
  * decodes real PNG/JPEG/BMP/GIF, `WavCodec` (JDK `javax.sound`)
  * real PCM16 WAV/AIFF/AU, and `Y4mCodec` real YUV4MPEG2 video
  * streams per-frame — all with zero external dependencies. Swap in
  * a JNI/javacpp codec for compressed video in production; the
  * operator signatures don't change.
  *
  * Scale notes: binary-heavy tables want
  * `spark.sql.files.maxPartitionBytes` sized so one partition of blobs
  * fits in executor memory; decode is CPU-bound map-side work with no
  * shuffle — `mapPartitions` preserves partitioning, and downstream
  * feature joins shuffle only the (small) extracted features, never
  * the payload bytes.
  */
object Multimodal {

  final case class MediaAsset(asset_id: Long, kind: String,
      payload: Array[Byte])
  final case class DecodedMeta(asset_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, feat: Array[Long])
  final case class Frame(asset_id: Long, frame_no: Int, offset: Long,
      length: Long)

  /** Decode seam: (width, height, channels, feature vector) from a
    * payload. Implementations must be deterministic and serializable
    * (instances ship to executors inside the mapPartitions closure). */
  trait Codec extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Long])
  }

  /** The deterministic stand-in codec: every output is exact integer
    * arithmetic on the payload bytes (so tests — and the DuckDB oracle
    * on text-derived payloads — can replay it bit-for-bit). */
  object FakeCodec extends Codec {
    val FeatDims = 8

    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Long]) = {
      val n = payload.length
      val width = (n * 7) % 640 + 16
      val height = (if (n > 0) (payload(0) & 0xff) * 2 % 480 else 0) + 16
      val feat = new Array[Long](FeatDims)
      var i = 0
      while (i < n) {
        feat(i % FeatDims) += (payload(i) & 0xff).toLong
        i += 1
      }
      (width, height, 3, feat)
    }
  }

  /** REAL image decode via `javax.imageio` (in the JDK — PNG, JPEG,
    * BMP, GIF; no external dependency). Feature vector = exact integer
    * pixel statistics: per-channel sums (R, G, B, A) and a 4-bin
    * luminance histogram — deterministic given the decoded raster.
    * Oracle queries keep [[FakeCodec]] (SQL can't decode PNGs); this
    * path is pinned by MultimodalSpec on generated image bytes. */
  object ImageIoCodec extends Codec {
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Long]) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val channels = img.getColorModel.getNumComponents
      val feat = new Array[Long](FakeCodec.FeatDims)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val argb = img.getRGB(x, y)
          val a = (argb >>> 24) & 0xff
          val r = (argb >>> 16) & 0xff
          val g = (argb >>> 8) & 0xff
          val b = argb & 0xff
          feat(0) += r; feat(1) += g; feat(2) += b; feat(3) += a
          // integer ITU-R 601 luma approximation, then 4 bins of 64
          val luma = (r * 299 + g * 587 + b * 114) / 1000
          feat(4 + math.min(3, luma / 64)) += 1
          x += 1
        }
        y += 1
      }
      (w, h, channels, feat)
    }
  }

  /** REAL audio decode via `javax.sound.sampled` (in the JDK — WAV /
    * AIFF / AU containers; no external dependency, no audio hardware
    * needed). PCM16 only (the overwhelmingly common raw format).
    * Metadata mapping for the audio modality: width = sample frames,
    * height = sample rate (Hz), channels = channels. Feature vector =
    * exact integer sample statistics: per-channel sample sums (first
    * 4 channels) and a 4-bin amplitude-magnitude histogram — fully
    * deterministic given the PCM payload. Oracle queries keep
    * [[FakeCodec]] (SQL can't parse RIFF); this path is pinned by
    * MultimodalSpec on generated WAV bytes. */
  object WavCodec extends Codec {
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Long]) = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        require(fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16,
          s"WavCodec supports PCM16 only, got $fmt")
        val channels = fmt.getChannels
        val big = fmt.isBigEndian
        val bytes = in.readAllBytes()
        val feat = new Array[Long](FakeCodec.FeatDims)
        var i = 0
        var idx = 0
        while (i + 1 < bytes.length) {
          val s =
            if (big) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
            else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
          // per-channel sums for the FIRST 4 channels only; channels
          // beyond that are dropped (never folded into channel 0/1)
          val ch = idx % channels
          if (ch < 4) feat(ch) += s.toLong
          val mag = math.abs(s.toInt)
          feat(4 + math.min(3, mag / 8192)) += 1
          i += 2
          idx += 1
        }
        val frames = idx / channels
        (frames, fmt.getSampleRate.toInt, channels, feat)
      } finally in.close()
    }
  }

  /** One decoded video frame: dimensions plus exact integer luma
    * statistics (sum + 4-bin histogram of Y-plane values / 64). */
  final case class VideoFrame(asset_id: Long, frame_no: Int,
      width: Int, height: Int, luma_sum: Long, luma_hist: Array[Long])

  /** Video decode seam: per-frame (width, height, lumaSum, 4-bin
    * histogram) from a container payload. Video is per-frame shaped,
    * so it gets its own trait rather than abusing [[Codec]]'s
    * single-tuple contract. */
  trait VideoCodec extends Serializable {
    def frames(payload: Array[Byte])
        : Iterator[(Int, Int, Long, Array[Long])]
  }

  /** REAL video decode for the YUV4MPEG2 (`.y4m`) container — the
    * standard UNCOMPRESSED interchange format (mjpegtools/ffmpeg):
    * one ASCII header line (`YUV4MPEG2 W<w> H<h> ... C<space>`), then
    * per frame an ASCII `FRAME` line followed by raw planar YUV.
    * Parsed with zero external dependencies; C420* (quarter-size
    * chroma), C444 (full-size) and Cmono (no chroma) plane layouts.
    * Truncated payloads and unknown magics refuse loudly — a silent
    * partial decode would corrupt every downstream statistic.
    * Features are exact integer luma statistics, so the path is
    * deterministic and (on constructed payloads) oracle-replayable. */
  object Y4mCodec extends VideoCodec {
    def frames(payload: Array[Byte])
        : Iterator[(Int, Int, Long, Array[Long])] = {
      var pos = payload.indexOf('\n'.toByte)
      require(pos > 0, "y4m: missing header line")
      val header = new String(payload, 0, pos, "US-ASCII")
      pos += 1
      val toks = header.split(' ')
      require(toks.headOption.contains("YUV4MPEG2"),
        s"y4m: bad magic '${toks.headOption.getOrElse("")}'")
      def param(p: Char): Option[String] =
        toks.tail.find(_.startsWith(p.toString)).map(_.drop(1))
      val w = param('W').map(_.toInt).getOrElse(
        throw new IllegalArgumentException("y4m: no W (width) param"))
      val h = param('H').map(_.toInt).getOrElse(
        throw new IllegalArgumentException("y4m: no H (height) param"))
      require(w > 0 && h > 0, s"y4m: bad dimensions ${w}x$h")
      val cs = param('C').getOrElse("420")
      val chromaBytes = cs match {
        case c if c.startsWith("420") =>
          require(w % 2 == 0 && h % 2 == 0,
            s"y4m: C420 needs even dimensions, got ${w}x$h")
          2 * (w / 2) * (h / 2)
        case c if c.startsWith("444") => 2 * w * h
        case c if c.startsWith("mono") => 0
        case other => throw new IllegalArgumentException(
          s"y4m: unsupported colourspace C$other")
      }
      val frameBytes = w * h + chromaBytes
      var frameNo = 0
      new Iterator[(Int, Int, Long, Array[Long])] {
        def hasNext: Boolean = pos < payload.length
        def next(): (Int, Int, Long, Array[Long]) = {
          val nl = payload.indexOf('\n'.toByte, pos)
          require(nl >= pos + 5 &&
            new String(payload, pos, 5, "US-ASCII") == "FRAME",
            s"y4m: frame $frameNo: expected FRAME marker at byte $pos")
          val dataStart = nl + 1
          require(dataStart + frameBytes <= payload.length,
            s"y4m: frame $frameNo truncated (need $frameBytes bytes, " +
              s"have ${payload.length - dataStart})")
          var sum = 0L
          val hist = new Array[Long](4)
          var i = dataStart
          val yEnd = dataStart + w * h
          while (i < yEnd) {
            val v = payload(i) & 0xff
            sum += v
            hist(math.min(3, v / 64)) += 1
            i += 1
          }
          pos = dataStart + frameBytes
          val out = (w, h, sum, hist)
          frameNo += 1
          out
        }
      }
    }
  }

  /** Decode video payloads to one [[VideoFrame]] row per frame — the
    * per-frame complement of [[decodeMeta]]'s one-row-per-asset shape.
    * Map-side only (no shuffle): the payload bytes never leave their
    * partition; only the small per-frame statistics flow downstream. */
  def decodeVideoFrames(assets: Dataset[MediaAsset],
      codec: VideoCodec = Y4mCodec): Dataset[VideoFrame] = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      val payload =
        if (a.payload == null) Array.empty[Byte] else a.payload
      if (payload.isEmpty) Iterator.empty
      else codec.frames(payload).zipWithIndex.map {
        case ((w, h, sum, hist), f) =>
          VideoFrame(a.asset_id, f, w, h, sum, hist)
      }
    }
  }

  /** Decode payloads to typed metadata + a feature vector, processing
    * each partition in `batchSize` slices (the batch shape a real
    * vectorized codec — or Arrow page — would use). No shuffle. The
    * codec is pluggable: [[FakeCodec]] (default, oracle-replayable) or
    * [[ImageIoCodec]] (real JDK image decoding). */
  def decodeMeta(assets: Dataset[MediaAsset], batchSize: Int = 256,
      codec: Codec = FakeCodec): Dataset[DecodedMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { a =>
          val payload = if (a.payload == null) Array.empty[Byte] else a.payload
          val (w, h, c, feat) = codec.decode(payload)
          DecodedMeta(a.asset_id, a.kind, payload.length.toLong, w, h, c, feat)
        }
      }
    }
  }

  /** "Resize": recompute metadata for a target box preserving aspect
    * ratio (integer math; payload untouched — a real codec would
    * re-encode). */
  def resizeMeta(meta: Dataset[DecodedMeta], maxW: Int, maxH: Int)
      : Dataset[DecodedMeta] = {
    import meta.sparkSession.implicits._
    meta.map { m =>
      if (m.width <= maxW && m.height <= maxH) m
      else {
        // scale = min(maxW/w, maxH/h) in exact rational arithmetic
        val byW = m.height.toLong * maxW <= m.width.toLong * maxH
        val (nw, nh) =
          if (byW) (maxW, math.max(1, (m.height.toLong * maxW / m.width).toInt))
          else (math.max(1, (m.width.toLong * maxH / m.height).toInt), maxH)
        m.copy(width = nw, height = nh)
      }
    }
  }

  /** "Frame-sample" a video payload: one frame descriptor per
    * `frameBytes` block, up to `maxFrames`, evenly strided. */
  def sampleFrames(assets: Dataset[MediaAsset], frameBytes: Int = 1024,
      maxFrames: Int = 8): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      val n = if (a.payload == null) 0L else a.payload.length.toLong
      val total = ((n + frameBytes - 1) / frameBytes).toInt
      val take = math.min(total, maxFrames)
      val stride = if (take == 0) 1 else math.max(1, total / take)
      (0 until take).iterator.map { f =>
        val block = f.toLong * stride
        Frame(a.asset_id, f, block * frameBytes,
          math.min(frameBytes.toLong, n - block * frameBytes))
      }
    }
  }

  /** Documents → fake media assets (payload = UTF-8 text bytes), the
    * test/oracle bridge: ASCII corpus text makes every byte value
    * reproducible in SQL via ascii(). */
  def assetsFromDocuments(spark: SparkSession, sfDir: String)
      : Dataset[MediaAsset] = {
    import spark.implicits._
    graft.sources.Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id").as("asset_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaAsset]
  }
}
