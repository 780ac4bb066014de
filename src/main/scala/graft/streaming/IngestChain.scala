package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The PRODUCTION INGEST CHAIN as one streaming pipeline (r13 verdict
  * item 3): [[AdmissionStream.admittedStream]] → [[ExciseStream
  * .exciseStream]] in a single query, so only gate-admitted documents
  * ever reach span excision — the composition ExciseStreamSpec proves
  * in batch, now executing as one stream. Spark allows a query with
  * multiple flatMapGroupsWithState stages only when every stage and
  * the sink run in APPEND mode; both collapses here are zero-state
  * per-batch folds, for which append and update are semantically
  * identical, so the chain simply runs both stages in append.
  *
  * Duplicate-key policy (r13 verdict item 6 / ADVICE 3): the collapse
  * stages `require`-fail on a repeated doc_id within a micro-batch —
  * correct for the append-only ingest-key contract, where a duplicate
  * is a corrupted feed, but a source that can REPLAY a delivery (at-
  * least-once transports) turns one replayed record into a query
  * abort. [[firstWins]] is the opt-in pre-collapse dedup for such
  * sources: one deterministic representative per key per micro-batch,
  * BEFORE any marker fan-out (deduping after the n-gram/band explode
  * would be too late — hit rows of two same-id payloads are
  * indistinguishable once merged). The alternative policy for feeds
  * that want the violators preserved is dead-letter routing: split the
  * stream on the same within-batch rank and sink rank > 1 rows aside —
  * same stage, different sink; the chain itself stays strict either
  * way. With neither, the documented expectation is
  * restart-after-upstream-fix: the require names the offending key.
  */
object IngestChain {

  case class IngestDoc(doc_id: Long, text: String, source: String)

  /** Opt-in first-wins pre-collapse dedup: one representative per
    * doc_id per micro-batch, chosen deterministically (min by (text,
    * source) — replays of the same delivery are identical payloads, so
    * the choice only matters for genuinely conflicting writes, where
    * any deterministic pick beats a nondeterministic merge). Zero
    * retained state: the group fold never writes state, exactly the
    * collapse contract of the downstream stages. */
  def firstWins(docs: DataFrame,
                mode: OutputMode = OutputMode.Append): Dataset[IngestDoc] = {
    import docs.sparkSession.implicits._
    def keep(id: Long, rows: Iterator[IngestDoc],
             state: GroupState[Boolean]): Iterator[IngestDoc] =
      Iterator.single(rows.minBy(r => (r.text, r.source)))
    docs.select(col("doc_id"), col("text"), col("source")).as[IngestDoc]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(mode, GroupStateTimeout.NoTimeout)(keep)
  }

  /** Gate → excise as ONE streaming query over the frozen corpus
    * index tables (exact hashes + anchored band probe for the gate,
    * the ngram lake table for the excision): admitted documents are
    * excised of spans duplicating the prior corpus, dropped documents
    * never reach the excision join. `dedupeKeys` opts into
    * [[firstWins]] at the door. */
  def chainStream(docs: DataFrame, exactIdx: DataFrame, probe: DataFrame,
                  ngramIdx: DataFrame, threshold: Double = 0.3,
                  n: Int = ExciseStream.ExciseN,
                  dedupeKeys: Boolean = false): Dataset[ExciseStream.Excised] = {
    val in = if (dedupeKeys) firstWins(docs).toDF() else docs
    val admitted = AdmissionStream
      .admittedStream(in, exactIdx, probe, threshold, OutputMode.Append)
    ExciseStream.exciseStream(admitted.toDF(), ngramIdx, n, OutputMode.Append)
  }

  /** Batch twin of the chain — the equivalence baseline IngestChainSpec
    * pins bitwise: the gate's batch form restricted to admitted ids,
    * fed to the SHARED excision body. Per-document independence of
    * [[graft.functions.TextAnalytics.exciseAgainstIndex]] (the probe
    * and collapse are per-doc) makes this also bitwise-equal, doc for
    * doc, to q_incremental_excision on the docs both admit. */
  def chainBatch(docs: DataFrame, exactIdx: DataFrame, probe: DataFrame,
                 ngramIdx: DataFrame, threshold: Double = 0.3,
                 n: Int = ExciseStream.ExciseN): DataFrame = {
    val admitted = AdmissionStream.gateBatch(docs, exactIdx, probe, threshold)
      .filter(col("outcome") === "admitted").select(col("doc_id"))
    ExciseStream.exciseBatch(
      docs.join(admitted, Seq("doc_id"), "left_semi"), ngramIdx, n)
  }
}
