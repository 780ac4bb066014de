package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.CountSketch

/** Streaming HyperLogLog — the stateful counterpart of
  * [[graft.functions.CountSketch.hllDistinct]]'s register build
  * (reference: kafka_overwatch recomputes per-scan statistics from
  * scratch each interval; a live pipeline wants the cardinality sketch
  * to track the stream).
  *
  * The state IS the register file: a native Update-mode streaming
  * aggregation keyed by (lang, bucket), so the state store holds at
  * most HllM rows per language no matter how many tokens or distinct
  * tokens flow through. max(rho) is associative/commutative and
  * monotone, so after any prefix of the stream the registers equal the
  * batch build over the same documents exactly, and no watermark is
  * needed: registers never expire, they only ratchet upward (proven in
  * HllStreamSpec, which also pins the estimate to the batch value
  * bit-for-bit — the integer-grid harmonic sum is order-free).
  *
  * Cardinality answers come from rolling up a register snapshot with
  * the shared [[graft.functions.CountSketch.hllEstimate]], exactly as
  * batch does.
  */
object HllStream {

  /** (lang, bucket) -> running max-rho registers over a streaming
    * `docs` source with `lang` and `text` columns. Update output mode:
    * each micro-batch emits the registers it raised. */
  def registers(docs: DataFrame): DataFrame =
    CountSketch.hllTokenUpdates(docs)
      .groupBy(col("lang"), col("bucket"))
      .agg(max(col("rho")).as("m"))

  /** Per-language raw cardinality estimate from a materialized register
    * snapshot — identical arithmetic to batch. */
  def estimate(registerSnapshot: DataFrame): DataFrame =
    CountSketch.hllEstimate(registerSnapshot)
}
