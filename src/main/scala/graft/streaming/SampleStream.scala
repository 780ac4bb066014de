package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Streaming consistent sampling — the ingest-time twin of
  * operators/Sampling: the SAME hash-threshold predicate (same
  * constants, same modulus) applied as a stateless streaming filter, so
  * a document's sample membership is identical whether it arrives in a
  * batch backfill or on the stream, across restarts, with ZERO state
  * (the predicate is a pure row-local expression — no watermark, no
  * store, nothing to checkpoint but the source offsets).
  *
  * This is the 100 TB deployment shape for "keep an eyeball slice of
  * the firehose": membership is a function of the id alone, so the
  * sampled slice stays id-consistent with every other table sampled by
  * the same rule, and downsizing the rate later (a smaller cut) yields
  * a strict subset of the earlier sample.
  */
object SampleStream {

  /** The shared membership predicate over an id column. */
  def keep(id: Column): Column = Sampling.keepPredicate(id)

  /** Filter an ingest frame (streaming or batch) to the sample slice. */
  def sampled(docs: DataFrame): DataFrame =
    docs.filter(keep(col("doc_id")))
}
