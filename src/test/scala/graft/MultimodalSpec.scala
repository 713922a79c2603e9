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
}
