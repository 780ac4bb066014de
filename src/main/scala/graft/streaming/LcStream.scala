package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{CountSketch, TextAnalytics}

/** Streaming linear counter — the stateful counterpart of
  * [[graft.functions.CountSketch.distinctSketch]]'s occupancy, closing
  * the streaming side of the fixed-memory family (CMS frequencies /
  * linear-counting occupancy-regime distincts / HLL unbounded
  * distincts — [[CmsStream]], this, [[HllStream]]).
  *
  * The state IS the bucket array: an Update-mode aggregation keyed by
  * (lang, bucket) holds at most LcBuckets rows per language no matter
  * how many tokens flow through. Occupancy is a pure function of the
  * distinct key set, and keys only ever appear (never expire — the
  * counter is a running structure, not a window), so after any stream
  * prefix the occupied set equals the batch build over the same
  * documents exactly (LcStreamSpec). Per-bucket hit counts ride along
  * for free from the same aggregation.
  */
object LcStream {

  /** (lang, bucket) -> running hit counts over a streaming `docs`
    * source with `lang` and `text` columns; the DISTINCT KEY SET is the
    * sketch. Update output mode: each micro-batch emits the buckets it
    * touched. */
  def occupancy(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
        explode(TextAnalytics.tokens(col("text"))).as("token"))
      .withColumn("bucket", CountSketch.lcBucket(col("token")))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("hits"))

  /** Per-language occupied count + load factor from a materialized
    * occupancy snapshot — identical arithmetic to the batch sketch. */
  def loadFactor(occupancySnapshot: DataFrame): DataFrame =
    occupancySnapshot.groupBy(col("lang"))
      .agg(count(lit(1)).as("occupied"))
      .withColumn("load_factor",
        col("occupied").cast("double") / lit(CountSketch.LcBuckets.toDouble))
}
