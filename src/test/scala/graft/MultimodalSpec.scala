package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val assets = Multimodal.syntheticAssets(spark, 30).cache()

  test("synthetic assets conform to the canonical schema") {
    assert(assets.schema.fieldNames.toSeq === Multimodal.assetSchema.fieldNames.toSeq)
    assert(assets.count() === 30)
    assert(assets.select("modality").distinct().count() === 3)
  }

  test("feature extraction is deterministic, batched, and null-safe") {
    val f1 = Multimodal.extractFeatures(assets, batchSize = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val f2 = Multimodal.extractFeatures(assets, batchSize = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(f1 === f2)             // batch boundary invariant
    assert(f1.values.forall(_.length === 16))
    import spark.implicits._
    val withNull = Seq((99L, "image", null.asInstanceOf[Array[Byte]]))
      .toDF("asset_id", "modality", "content")
    val nf = Multimodal.extractFeatures(withNull).head()
    assert(nf.isNullAt(2))
  }

  test("frame sampling explodes only video rows with windowed byte slices") {
    val frames = Multimodal.sampleFrames(assets)
    val mods = assets.where(col("modality") === "video").count()
    assert(mods > 0)
    assert(frames.select("asset_id").distinct().count() === mods)
    assert(frames.columns.toSeq === Seq("asset_id", "frame_index", "frame_bytes"))
  }

  test("typed metadata accessors (resize plumbing)") {
    val d = Multimodal.withDimensions(assets)
    assert(d.where(col("width").isNull || col("height").isNull).count() === 0)
    assert(d.where(col("aspect") <= 0).count() === 0)
  }

  test("probeAvMetadata: real MP3/MP4 stream metadata over the binary column") {
    import spark.implicits._
    val frame = MediaFixtures.mp3Frame
    val mp3 = frame ++ frame
    val mp4 = MediaFixtures.mp4("M4A ", timescale = 600, duration = 900)
    val df = Seq((1L, "audio", mp3), (2L, "video", mp4),
      (3L, "audio", "junk".getBytes)).toDF("asset_id", "modality", "content")
    val probed = graft.operators.Multimodal.probeAvMetadata(df)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(probed(1L).getAs[String]("container") === "mp3")
    assert(probed(1L).getAs[Int]("bitrate_kbps") === 128)
    assert(probed(1L).getAs[Int]("n_frames") === 2)
    assert(probed(2L).getAs[String]("container") === "mp4")
    assert(probed(2L).getAs[String]("brand") === "M4A ")
    assert(probed(2L).getAs[Long]("duration_ms") === 1500L)
    assert(probed(3L).getAs[String]("container") === null)
  }

  test("encodeBmp is the exact inverse of decodeBmp (incl. row padding)") {
    import graft.operators.MediaCodecs
    // width 3 → rowSize 12 with 3 pad bytes per row: the padding path
    for ((w, h) <- Seq((3, 2), (4, 1), (1, 5))) {
      val rgb = Array.tabulate(w * h * 3)(i => (i * 37 + 11) % 256)
      val img = MediaCodecs.RasterImage(w, h, rgb)
      val decoded = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(img))
      assert(decoded.isDefined, s"decode failed at ${w}x$h")
      assert(decoded.get.width === w)
      assert(decoded.get.height === h)
      assert(decoded.get.rgb.toSeq === rgb.toSeq, s"pixels at ${w}x$h")
    }
  }

  test("encodeWavPcm16 is the exact inverse of decodeWav") {
    import graft.operators.MediaCodecs
    val pcm = Array.tabulate(300)(i => ((i * 991 + 7) % 65536 - 32768).toShort)
    val decoded = MediaCodecs.decodeWav(MediaCodecs.encodeWavPcm16(pcm, 8000))
    assert(decoded.isDefined)
    assert(decoded.get.sampleRate === 8000)
    assert(decoded.get.channels === 1)
    assert(decoded.get.samples.toSeq === pcm.toSeq.map(_ / 32768.0f))
  }

  test("textMediaRoundTrip: hand-computed features for a known doc") {
    import spark.implicits._
    val df = Seq((7L, "abcd")).toDF("doc_id", "text")
    val r = Multimodal.textMediaRoundTrip(df).head()
    assert(r.getAs[Long]("n_bytes") === 4L)
    assert(r.getAs[Long]("img_w") === 2L)      // ceil(sqrt(4))
    assert(r.getAs[Long]("img_h") === 2L)
    // rowSize = (2*3+3)/4*4 = 8; 54 + 8*2
    assert(r.getAs[Long]("bmp_bytes") === 70L)
    assert(r.getAs[Double]("mean_lum") === (97 + 98 + 99 + 100) / 4.0)
    assert(r.getAs[Long]("wav_bytes") === 44L + 8L)
    assert(r.getAs[Long]("n_samples") === 4L)
    assert(r.getAs[Double]("mean_amp") === (-31 - 30 - 29 - 28) / 4.0 / 128.0)
    assert(r.getAs[Double]("peak_amp") === 31.0 / 128.0)
    assert(r.getAs[Double]("duration_sec") === 4.0 / 8000.0)
  }

  test("textMediaRoundTrip survives padding-heavy and single-byte docs") {
    import spark.implicits._
    // n=5 → w=3,h=2: one padded pixel; n=1 → 1x1; n=9 → exact square
    val df = Seq((1L, "abcde"), (2L, "Z"), (3L, "123456789"))
      .toDF("doc_id", "text")
    val rows = Multimodal.textMediaRoundTrip(df)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Long]("img_w") === 3L)
    assert(rows(1L).getAs[Long]("img_h") === 2L)
    // padding zeros dilute the mean over w*h pixels
    assert(rows(1L).getAs[Double]("mean_lum") ===
      (97 + 98 + 99 + 100 + 101) / 6.0)
    assert(rows(2L).getAs[Long]("img_w") === 1L)
    assert(rows(2L).getAs[Double]("mean_lum") === 90.0)
    assert(rows(3L).getAs[Long]("img_w") === 3L)
    assert(rows(3L).getAs[Long]("img_h") === 3L)
  }
}
