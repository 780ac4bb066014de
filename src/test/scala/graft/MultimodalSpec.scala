package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")

  test("binary asset plumbing: decode produces fixed-width features for every asset") {
    import spark.implicits._
    val assets = Multimodal.assetsFrom(docs)
    val feats = Multimodal.decodeFeatures(assets)
    val rows = feats.collect()
    assert(rows.length === docs.count())
    assert(rows.forall(_.features.length === Multimodal.FeatureBins))
    // histogram is normalized
    assert(rows.forall(r => math.abs(r.features.sum - 1.0) < 1e-9))
    // deterministic: same asset twice -> same features
    val one = feats.filter($"asset_id" === 0L).collect()(0)
    val again = Multimodal.decodeFeatures(assets.filter($"asset_id" === 0L)).collect()(0)
    assert(one.features.toSeq === again.features.toSeq)
  }

  test("resize plan never upscales and preserves aspect ratio direction") {
    import spark.implicits._
    val plan = Multimodal.resizePlan(Multimodal.assetsFrom(docs)).collect()
    assert(plan.forall { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (tw, th) = (r.getAs[Int]("target_w"), r.getAs[Int]("target_h"))
      tw <= math.max(w, 256) && th <= math.max(h, 256) && tw >= 1 && th >= 1
    })
  }

  test("frame-sample plan emits capped every-nth indexes for video only") {
    import spark.implicits._
    val plan = Multimodal.frameSamplePlan(Multimodal.assetsFrom(docs))
    val kinds = Multimodal.assetsFrom(docs).filter($"kind" === "video").count()
    assert(plan.count() === kinds)
    val idx = plan.limit(1).collect()(0)
      .getAs[scala.collection.Seq[Long]]("frame_indexes").toSeq
    assert(idx === Seq(0L, 30L, 60L, 90L, 120L, 150L, 180L, 210L))
  }

  test("feature rollup groups per modality") {
    val stats = Multimodal.featureStats(
      Multimodal.decodeFeatures(Multimodal.assetsFrom(docs)))
    assert(stats.count() === 3L * Multimodal.FeatureBins)
  }
}
