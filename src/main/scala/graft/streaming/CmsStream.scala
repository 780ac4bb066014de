package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expressions.PolyHash
import graft.functions.{CountSketch, TextAnalytics}

/** Streaming Count-Min sketch — the stateful counterpart of
  * [[graft.functions.CountSketch.cmsHeavyHitters]]'s cell build
  * (reference: kafka_overwatch's periodic per-topic statistics are the
  * batch analogue; a live pipeline wants the frequency sketch to track
  * the stream instead of rebuilding it per scan).
  *
  * The state IS the sketch: a native Update-mode streaming aggregation
  * keyed by (row_i, bucket), so the state store holds at most
  * Depth * Width = 4096 rows no matter how many tokens or distinct
  * tokens flow through — the bounded-state property that makes CMS the
  * right streaming frequency structure (an exact per-token streaming
  * count would grow state with the vocabulary). Cell arithmetic is the
  * same additive sum as batch over the same
  * [[graft.functions.CountSketch.cellStructs]] geometry, so after any
  * prefix of the stream the cells equal the batch build over the same
  * documents exactly (proven in CmsStreamSpec), and no watermark is
  * needed: cells never expire, they only accumulate — the sketch is a
  * running total, not a window.
  *
  * Heavy-hitter answers come from probing a cell snapshot with a
  * bounded token set ([[probe]]) — the same split as batch, where the
  * probe side is the k-row broadcast and the sketch side is the
  * 4096-cell table.
  */
object CmsStream {

  /** (row_i, bucket) -> running cell counts over a streaming `docs`
    * source with a `text` column. Update output mode: each micro-batch
    * emits the cells it changed. */
  def cells(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalytics.tokens(col("text"))).as("token"))
      .withColumn("h", PolyHash.polyhash(col("token")))
      .select(explode(CountSketch.cellStructs(col("h"))).as("rb"))
      .groupBy(col("rb.row_i").as("row_i"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cell"))

  /** CMS point estimates for a bounded token set against a materialized
    * cell snapshot (the min-over-rows probe, identical to batch). */
  def probe(cellSnapshot: DataFrame, tokens: DataFrame): DataFrame =
    tokens.withColumn("h", PolyHash.polyhash(col("token")))
      .select(col("token"), explode(CountSketch.cellStructs(col("h"))).as("rb"))
      .select(col("token"), col("rb.row_i").as("row_i"),
        col("rb.bucket").as("bucket"))
      .join(cellSnapshot, Seq("row_i", "bucket"))
      .groupBy(col("token")).agg(min(col("cell")).as("est"))
}
