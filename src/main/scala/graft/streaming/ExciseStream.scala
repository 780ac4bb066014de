package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.expressions.NgramHashes
import graft.functions.TextAnalytics

/** Streaming CROSS-CRAWL SPAN EXCISION — the twin of
  * q_incremental_excision, in the index-then-serve split of
  * [[AdmissionStream]]/[[StripStream]]: the corpus-to-date n-gram-hash
  * index ([[graft.operators.IncrementalDedup.ngramIndex]], the lake's
  * fourth table) is FROZEN, and every arriving document has its spans
  * that duplicate the prior corpus excised at the door — the streaming
  * shape of the ExactSubstr apply half (Lee et al. 2022) run
  * corpus-to-date.
  *
  * Plan shape, all stages stateless: the positional n-gram stream is
  * the row-local [[NgramHashes]] kernel; the index lookup is one
  * stream-static equi-join on `ngh` — SHUFFLE_HASH pinned: the index is
  * TOKEN-proportional (every distinct corpus n-gram), the strongest
  * possible never-broadcast case; the per-document collapse is
  * [[SpanKernel.excise]] through a flatMapGroupsWithState that NEVER
  * writes state — retained state is ZERO rows (ExciseStreamSpec
  * asserts it; the StreamBench twin measures it under load).
  *
  * Contract vs the batch query: [[exciseBatch]] over the same frozen
  * index is bitwise the stream's drained output, and IS the
  * q_incremental_excision operator body — the batch query just feeds
  * it the gate-admitted subset (in production the ingest chain is
  * [[AdmissionStream.gateStream]] → this, so only admitted docs reach
  * the excision; the stream itself is subset-agnostic). Index
  * freshness follows the admission-gate story: spans duplicating docs
  * that arrived AFTER the index was versioned are not excised until
  * the next rebuild, and the weekly reconciliation cadence retires the
  * difference. */
object ExciseStream {

  /** Shingle width — the dup-span family contract. */
  val ExciseN = 5

  case class Piece(doc_id: Long, text: String, pos: Long, is_base: Boolean)
  case class Excised(doc_id: Long, cleaned_text: String, n_tokens: Long,
                     kept_tokens: Long, bytes_removed: Long)

  /** Batch form against the frozen index — the equivalence baseline for
    * the stream and LITERALLY the q_incremental_excision operator body
    * ([[TextAnalytics.exciseAgainstIndex]], one shared definition). */
  def exciseBatch(docs: DataFrame, ngramIdx: DataFrame,
                  n: Int = ExciseN): DataFrame =
    TextAnalytics.exciseAgainstIndex(docs, ngramIdx, n)

  /** The streaming excision: one base row per doc (carrying its text)
    * plus one row per index-hit position from the stream-static join,
    * collapsed per doc_id through [[SpanKernel.excise]] with zero
    * retained state. `mode` as in [[AdmissionStream.gateStream]]:
    * Update standalone (the original twin), Append when chained after
    * the gate in one query ([[IngestChain.chainStream]]). */
  def exciseStream(docs: DataFrame, ngramIdx: DataFrame,
                   n: Int = ExciseN,
                   mode: OutputMode = OutputMode.Update): Dataset[Excised] = {
    import docs.sparkSession.implicits._
    val base = docs.select(col("doc_id"), col("text"),
      lit(-1L).as("pos"), lit(true).as("is_base"))
    val hits = docs
      .select(col("doc_id"),
        posexplode(NgramHashes.ngram_pos_hashes(col("text"), n))
          .as(Seq("pos", "ngh")))
      .join(ngramIdx.hint("shuffle_hash"), Seq("ngh"))
      .select(col("doc_id"), lit("").as("text"),
        col("pos").cast("long").as("pos"), lit(false).as("is_base"))
    val pieces = base.unionByName(hits).as[Piece]

    def collapse(id: Long, rows: Iterator[Piece],
                 state: GroupState[Boolean]): Iterator[Excised] = {
      val rs = rows.toList
      // doc_id is the append-only INGEST KEY (a re-crawled page arrives
      // under a new id — the AdmissionStream recrawl contract): two
      // same-id rows in one micro-batch would merge both texts' hit
      // positions onto one arbitrary base — silent corruption. Fail the
      // query loudly instead; the batch form degrades the same way for
      // a non-unique key, so uniqueness is the shared contract. Replay-
      // capable sources opt into [[IngestChain.firstWins]] upstream (or
      // dead-letter the violators) rather than have this stage guess.
      require(rs.count(_.is_base) <= 1,
        s"duplicate doc_id $id within a micro-batch — the excision " +
          "stream requires the append-only unique ingest key")
      rs.find(_.is_base).map { b =>
        val (cleaned, nTokens, kept, bytesRemoved) = SpanKernel.excise(
          b.text, rs.filter(!_.is_base).map(_.pos).sorted, n)
        Excised(id, cleaned, nTokens, kept, bytesRemoved)
      }.iterator
    }

    pieces.groupByKey(_.doc_id)
      .flatMapGroupsWithState(mode, GroupStateTimeout.NoTimeout)(collapse)
  }
}
