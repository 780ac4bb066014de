package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, plus decode/feature-extract operators.
  *
  * The Spark-side shape is real and tested — schema, partitioning, batch
  * iteration (mapPartitions over a typed Dataset, the JVM analogue of a
  * pandas-batch UDF), fixed-width feature vectors. The actual media decode
  * is STUBBED with a deterministic byte-level computation (this
  * environment has no image/audio codecs): `decodeFeatures` computes a
  * 16-bin byte histogram + length instead of pixels. Swap `stubDecode`
  * for a real codec and nothing else changes.
  *
  * Scale notes: payloads stay off the shuffle path (features are extracted
  * in a map stage, payload column pruned immediately after); metadata-only
  * transforms (resize plans, frame sampling) are pure column expressions.
  */
object Multimodal {

  case class Asset(asset_id: Long, kind: String, payload: Array[Byte],
                   width: Int, height: Int, sample_rate: Int)
  case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Long,
                           counts: Array[Long], features: Array[Double])

  val FeatureBins = 16

  /** Deterministic asset table derived from documents: payload = utf-8
    * bytes, kind assigned round-robin by doc_id, fake dimensions from
    * n_chars. This stands in for a real (id, binary, metadata) lake table. */
  def assetsFrom(docs: DataFrame): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640 + 1).cast("int").as("width"),
      (col("n_chars") % 480 + 1).cast("int").as("height"),
      lit(16000).as("sample_rate")).as[Asset]
  }

  /** THE STUB: a real decoder would turn payload bytes into pixels/samples
    * here. Deterministic stand-in: a 16-bin byte histogram, returned as
    * raw counts (exact integers — the oracle-checkable form). */
  def stubDecode(payload: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](FeatureBins)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) / (256 / FeatureBins)) += 1L
      i += 1
    }
    hist
  }

  /** Batched decode/feature-extraction: one partition = one batch, the
    * JVM analogue of mapInPandas — per-partition setup cost (codec init)
    * is amortized across the batch. */
  def decodeFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // real impl: initialize codec once per batch here
      batch.map { a =>
        val counts = stubDecode(a.payload)
        val n = a.payload.length
        val feats = counts.map(c => if (n > 0) c.toDouble / n else 0.0)
        AssetFeatures(a.asset_id, a.kind, n.toLong, counts, feats)
      }
    }
  }

  /** Metadata-only transform: a resize *plan* (target dims per asset) —
    * pure column arithmetic, no payload touched. */
  def resizePlan(assets: Dataset[Asset], maxSide: Int = 256): DataFrame =
    assets.toDF().select(col("asset_id"), col("kind"), col("width"), col("height"),
      least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height")))
        .as("scale"))
      .withColumn("target_w", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("target_h", ceil(col("height") * col("scale")).cast("int"))

  /** Frame-sample plan for video assets: every nth frame index up to a
    * cap — array expression, no decode. */
  def frameSamplePlan(assets: Dataset[Asset], everyN: Int = 30, cap: Int = 8): DataFrame =
    assets.toDF().filter(col("kind") === "video")
      .select(col("asset_id"),
        slice(sequence(lit(0), lit(everyN * (cap - 1)), lit(everyN)), 1, cap)
          .as("frame_indexes"))

  /** Per-modality payload size profile — the stats that drive partition
    * and batch sizing for a binary lake (maxPartitionBytes, decode batch
    * shape): counts, min/max/exact-median bytes, total volume. All
    * order-free aggregates over the byte length computed inside the
    * scan; the payload itself never reaches the shuffle. */
  def sizeStats(assets: Dataset[Asset]): DataFrame =
    assets.toDF()
      .select(col("kind"), length(col("payload")).cast("long").as("bytes"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_assets"),
        min(col("bytes")).as("min_bytes"), max(col("bytes")).as("max_bytes"),
        AtScale.quantile(assets, col("bytes"), 0.5).as("median_bytes"),
        sum(col("bytes")).as("total_bytes"))

  /** Per-kind feature rollup (the downstream consumer of decode): pooled
    * byte distribution per modality from EXACT integer sums — the mean is
    * one double division at the end, so the result is order-independent
    * and bit-reproducible (an avg over per-asset doubles would depend on
    * accumulation order and could never hash-match an oracle). */
  def featureStats(features: Dataset[AssetFeatures]): DataFrame =
    features.toDF()
      .select(col("kind"), col("n_bytes"), posexplode(col("counts")))
      .groupBy(col("kind"), col("pos"))
      .agg(
        sum(col("col")).as("bin_count"),
        sum(col("n_bytes")).as("total_bytes"),
        (sum(col("col")).cast("double") / sum(col("n_bytes"))).as("pooled_feature"),
        count(lit(1)).as("n_assets"))
}
