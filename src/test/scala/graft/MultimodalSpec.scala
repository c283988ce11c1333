package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{Frame, MediaAsset}

/** Multimodal plumbing: schema, batching, null payloads, resize
  * rationals, frame sampling. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("decodeMeta: deterministic fake decode, batch-independent") {
    import spark.implicits._
    val assets = Seq(
      MediaAsset(1, "image", "hello world".getBytes("UTF-8")),
      MediaAsset(2, "audio", Array[Byte](0, 127, -1)),
      MediaAsset(3, "image", null)).toDS()
    def run(bs: Int) = Multimodal.decodeMeta(assets, bs)
      .collect().sortBy(_.asset_id)
      .map(m => (m.asset_id, m.n_bytes, m.width, m.height, m.feat.sum)).toSeq
    val a = run(1); val b = run(256)
    assert(a == b) // batch size never changes results
    val m1 = Multimodal.decodeMeta(assets).collect().find(_.asset_id == 1).get
    assert(m1.n_bytes == 11L)
    assert(m1.width == (11 * 7) % 640 + 16)
    assert(m1.height == ('h'.toInt * 2) % 480 + 16)
    assert(m1.feat.sum == "hello world".getBytes("UTF-8").map(_ & 0xff).sum)
    // null payload → empty decode, not a crash
    val m3 = Multimodal.decodeMeta(assets).collect().find(_.asset_id == 3).get
    assert(m3.n_bytes == 0L && m3.feat.forall(_ == 0L))
  }

  test("ImageIoCodec decodes a real PNG payload distributed") {
    import spark.implicits._
    // render two deterministic images, encode to real PNG bytes
    def png(w: Int, h: Int, rgb: (Int, Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y, w))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val white = png(8, 4, (_, _, _) => 0xffffff)
    val gradient = png(16, 16, (x, y, w) => {
      val v = (x * 255 / (w - 1)) & 0xff
      (v << 16) | (v << 8) | v
    })
    val assets = Seq(
      MediaAsset(1, "image", white),
      MediaAsset(2, "image", gradient)).toDS().repartition(2)
    val got = Multimodal
      .decodeMeta(assets, codec = Multimodal.ImageIoCodec)
      .collect().map(m => m.asset_id -> m).toMap
    // white 8×4: every channel sums to 255·32, all 32 pixels in the
    // top luma bin; PNG n_bytes is whatever the encoder produced
    assert(got(1L).width == 8 && got(1L).height == 4)
    assert(got(1L).channels == 3)
    assert(got(1L).feat.take(3).forall(_ == 255L * 32))
    assert(got(1L).feat(7) == 32L)
    assert(got(1L).n_bytes == white.length.toLong)
    // gradient 16×16: channel sums equal the constructed ramp exactly
    val expectSum = (0 until 16).map(x => x * 255 / 15).sum.toLong * 16
    assert(got(2L).width == 16 && got(2L).height == 16)
    assert(got(2L).feat.take(3).forall(_ == expectSum))
    assert(got(2L).feat.slice(4, 8).sum == 256L) // every pixel binned
    // a non-image payload fails loudly, not silently
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeMeta(
        Seq(MediaAsset(9, "image", "not a png".getBytes)).toDS(),
        codec = Multimodal.ImageIoCodec).collect()
    }
  }

  test("WavCodec decodes real PCM16 WAV payloads distributed") {
    import spark.implicits._
    // synthesize a stereo PCM16 WAV: ch0 = ramp 3f-50, ch1 = f
    val frames = 100
    val channels = 2
    def sample(f: Int, ch: Int): Int = if (ch == 0) 3 * f - 50 else f
    val pcm = new Array[Byte](frames * channels * 2) // little-endian
    for (f <- 0 until frames; ch <- 0 until channels) {
      val s = sample(f, ch)
      val off = (f * channels + ch) * 2
      pcm(off) = (s & 0xff).toByte
      pcm(off + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, channels,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val assets = Seq(
      MediaAsset(1, "audio", wav),
      MediaAsset(2, "audio", wav)).toDS().repartition(2)
    val got = Multimodal
      .decodeMeta(assets, codec = Multimodal.WavCodec)
      .collect().map(m => m.asset_id -> m).toMap
    val m = got(1L)
    // audio mapping: width = frames, height = sample rate, channels
    assert(m.width == frames && m.height == 8000 && m.channels == 2)
    // per-channel sums are exact integer arithmetic
    val sum0 = (0 until frames).map(f => sample(f, 0)).sum.toLong
    val sum1 = (0 until frames).map(f => sample(f, 1)).sum.toLong
    assert(m.feat(0) == sum0 && m.feat(1) == sum1)
    // every sample lands in the lowest amplitude bin (|s| < 8192)
    assert(m.feat(4) == (frames * channels).toLong)
    assert(m.feat(5) == 0L && m.feat(6) == 0L && m.feat(7) == 0L)
    assert(got(2L).feat.toSeq == m.feat.toSeq)
    // 6-channel (5.1) audio: channels 4/5 are DROPPED from the sums,
    // never folded back into channel 0/1
    val ch6 = 6
    val pcm6 = new Array[Byte](frames * ch6 * 2)
    for (f <- 0 until frames; ch <- 0 until ch6) {
      val s = ch + 1 // constant per channel → sum = frames·(ch+1)
      val off = (f * ch6 + ch) * 2
      pcm6(off) = (s & 0xff).toByte
      pcm6(off + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt6 = new javax.sound.sampled.AudioFormat(8000f, 16, ch6,
      true, false)
    val bos6 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm6), fmt6, frames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos6)
    val (fr6, _, nch6, feat6) = Multimodal.WavCodec.decode(bos6.toByteArray)
    assert(fr6 == frames && nch6 == 6)
    assert(feat6.take(4).toSeq ==
      (1 to 4).map(c => frames.toLong * c)) // first 4 channels only
    // a non-audio payload fails loudly, not silently
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeMeta(
        Seq(MediaAsset(9, "audio", "not a wav".getBytes)).toDS(),
        codec = Multimodal.WavCodec).collect()
    }
  }

  test("resizeMeta caps to box preserving aspect ratio") {
    import spark.implicits._
    val meta = Multimodal.decodeMeta(
      Seq(MediaAsset(1, "image", Array.fill[Byte](100)(65))).toDS())
      .map(_.copy(width = 1000, height = 500))
    val resized = Multimodal.resizeMeta(meta, 640, 480).collect()(0)
    assert(resized.width == 640 && resized.height == 320) // 500*640/1000
    val untouched = Multimodal.resizeMeta(
      meta.map(_.copy(width = 100, height = 50)), 640, 480).collect()(0)
    assert(untouched.width == 100 && untouched.height == 50)
  }

  test("Y4mCodec decodes real YUV4MPEG2 streams: C420/C444/mono plane " +
      "sizes, exact luma statistics, loud refusal on truncation and " +
      "bad magic, distributed per-frame rows") {
    import spark.implicits._
    def stream(cs: String, w: Int, h: Int,
        frames: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C$cs\n"
        .getBytes("US-ASCII"))
      val chroma = cs match {
        case c if c.startsWith("420") => 2 * (w / 2) * (h / 2)
        case c if c.startsWith("444") => 2 * w * h
        case _ => 0
      }
      frames.foreach { y =>
        out.write("FRAME\n".getBytes("US-ASCII"))
        out.write(y)
        (0 until chroma).foreach(_ => out.write(200))
      }
      out.toByteArray
    }
    // two 4x2 C420 frames with known Y planes
    val y0 = Array.tabulate[Byte](8)(i => (i * 10).toByte)   // 0..70
    val y1 = Array.tabulate[Byte](8)(i => (100 + i).toByte)  // 100..107
    val p420 = stream("420", 4, 2, Seq(y0, y1))
    val f = Multimodal.Y4mCodec.frames(p420).toSeq
    assert(f.map(x => (x._1, x._2)) == Seq((4, 2), (4, 2)))
    assert(f(0)._3 == (0 until 8).map(_ * 10).sum.toLong)
    assert(f(1)._3 == (0 until 8).map(100 + _).sum.toLong)
    // hist bins: frame 0 values 0..70 → bins(0)=7 (0..63), bins(1)=1
    assert(f(0)._4.toSeq == Seq(7L, 1L, 0L, 0L))
    // frame 1 values 100..107 → all bin 1
    assert(f(1)._4.toSeq == Seq(0L, 8L, 0L, 0L))
    // C444 and mono change only the plane stride, not the Y stats
    val p444 = stream("444", 4, 2, Seq(y0, y1))
    val pmono = stream("mono", 4, 2, Seq(y0, y1))
    assert(Multimodal.Y4mCodec.frames(p444).map(_._3).toSeq ==
      f.map(_._3))
    assert(Multimodal.Y4mCodec.frames(pmono).map(_._3).toSeq ==
      f.map(_._3))
    // truncation mid-frame refuses loudly, naming the frame
    val cut = p420.take(p420.length - 3)
    val e = intercept[IllegalArgumentException] {
      Multimodal.Y4mCodec.frames(cut).toSeq
    }
    assert(e.getMessage.contains("truncated"))
    // bad magic refuses
    intercept[IllegalArgumentException] {
      Multimodal.Y4mCodec.frames("AVI1 whatever\n".getBytes).toSeq
    }
    // odd dimensions under C420 refuse (quarter chroma undefined)
    intercept[IllegalArgumentException] {
      Multimodal.Y4mCodec.frames(
        stream("420", 3, 2, Seq(Array.fill[Byte](6)(1)))).toSeq
    }
    // the Dataset operator: one row per frame, null payload → none,
    // map-side only
    val assets = Seq(
      MediaAsset(1, "video", p420),
      MediaAsset(2, "video", null)).toDS()
    val rows = Multimodal.decodeVideoFrames(assets).collect()
      .sortBy(r => (r.asset_id, r.frame_no))
    assert(rows.map(r => (r.asset_id, r.frame_no, r.luma_sum)).toSeq ==
      Seq((1L, 0, f(0)._3), (1L, 1, f(1)._3)))
  }

  test("sampleFrames strides evenly and bounds the count") {
    import spark.implicits._
    val assets = Seq(MediaAsset(7, "video", Array.fill[Byte](10000)(1))).toDS()
    val frames: Seq[Frame] = Multimodal.sampleFrames(assets,
      frameBytes = 1024, maxFrames = 4).collect().sortBy(_.frame_no).toSeq
    assert(frames.size == 4)
    assert(frames.map(_.offset) == Seq(0L, 2048L, 4096L, 6144L))
    assert(frames.forall(_.length <= 1024))
    // empty payload → no frames
    val none = Multimodal.sampleFrames(
      Seq(MediaAsset(8, "video", Array.empty[Byte])).toDS()).collect()
    assert(none.isEmpty)
  }
}
