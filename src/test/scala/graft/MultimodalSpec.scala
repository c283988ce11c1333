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
