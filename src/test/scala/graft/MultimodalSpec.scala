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
}
