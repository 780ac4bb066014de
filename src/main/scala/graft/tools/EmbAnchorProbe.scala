package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: what the BucketAnchors cap costs the THRESHOLDED
  * cosine pair set and the dedup clusters at sf0.1 (review finding:
  * candidate-graph connectivity does not by itself guarantee
  * thresholded-graph connectivity — measure it, then guard it). */
object EmbAnchorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val capped = graft.functions.Similarity.scoredBucketPairs(emb)
      .filter(col("score") >= 0.4).select("vec_a", "vec_b").localCheckpoint()
    val uncapped = graft.functions.Similarity
      .scoredBucketPairs(emb, anchors = Int.MaxValue)
      .filter(col("score") >= 0.4).select("vec_a", "vec_b").localCheckpoint()
    val lost = uncapped.except(capped).count()
    println(s"[emb-anchor] bits=4 pairs capped=${capped.count()} " +
      s"uncapped=${uncapped.count()} lost=$lost")
    // the at-scale knob: one more bit doubles buckets, halves population,
    // and should disengage the cap at this corpus size
    val capped5 = graft.functions.Similarity
      .scoredBucketPairs(emb, bitsPerTable = 5)
      .filter(col("score") >= 0.4).select("vec_a", "vec_b").localCheckpoint()
    val uncapped5 = graft.functions.Similarity
      .scoredBucketPairs(emb, anchors = Int.MaxValue, bitsPerTable = 5)
      .filter(col("score") >= 0.4).select("vec_a", "vec_b").localCheckpoint()
    println(s"[emb-anchor] bits=5 pairs capped=${capped5.count()} " +
      s"uncapped=${uncapped5.count()} lost=${uncapped5.except(capped5).count()}")
    val capped6 = graft.functions.Similarity
      .scoredBucketPairs(emb, bitsPerTable = 6)
      .filter(col("score") >= 0.4).select("vec_a", "vec_b").localCheckpoint()
    val uncapped6 = graft.functions.Similarity
      .scoredBucketPairs(emb, anchors = Int.MaxValue, bitsPerTable = 6)
      .filter(col("score") >= 0.4).select("vec_a", "vec_b").localCheckpoint()
    println(s"[emb-anchor] bits=6 pairs capped=${capped6.count()} " +
      s"uncapped=${uncapped6.count()} lost=${uncapped6.except(capped6).count()}")
    spark.stop()
  }
}
