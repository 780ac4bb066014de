package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.expressions.NgramHashes
import graft.functions.TextAnalytics

/** Streaming BOILERPLATE STRIP — the twin of q_boilerplate_strip (r12
  * verdict item 4), in the index-then-serve split of [[AdmissionStream]]:
  * the per-source boilerplate n-gram set
  * ([[graft.functions.TextAnalytics.boilerSet]]) is the VERSIONED
  * STATE — built offline by the detect cadence, frozen between rebuilds,
  * served as the static side of a stream-static join — and every
  * arriving document is stripped at the door.
  *
  * Plan shape, all stages stateless: the positional n-gram stream is a
  * ROW-LOCAL kernel expression ([[NgramHashes]]); the boilerplate lookup
  * is one stream-static equi-join on (source, ngh) — SHUFFLE_HASH
  * pinned, never broadcast: the set is template-cardinality-bounded in
  * practice but corpus-derived (the dupPositions r8 lesson); the
  * per-document collapse (sort positions, islands, pack spans, run the
  * shared [[ExciseSpans]] kernel) runs through flatMapGroupsWithState
  * that NEVER writes state — every hit row of a document derives from
  * its single arrival row, so the group completes within its own
  * micro-batch and retained state is ZERO rows (StripStreamSpec asserts
  * it; the StreamBench twin measures it under load).
  *
  * Contract vs the batch operator: identical by construction — the
  * batch form [[stripBatch]] runs the same frozen set through the same
  * islands arithmetic (StripStreamSpec pins drained-stream == batch
  * bitwise, and stripBatch == the q_boilerplate_strip operator when the
  * set is the corpus's own detect output). The one semantic a stream
  * cannot reproduce is detect-half freshness: a template that only
  * crosses the df floor AFTER the set was versioned is not stripped
  * until the next rebuild — exactly the admission gate's
  * reconciliation-retires-the-difference story. */
object StripStream {

  /** Trigram width of the boilerplate family — the boilerRunFrame
    * contract. */
  val StripN = 3

  case class Piece(doc_id: Long, source: String, text: String, pos: Long,
                   is_base: Boolean)
  case class Stripped(doc_id: Long, source: String, cleaned_text: String,
                      n_tokens: Long, kept_tokens: Long, bytes_removed: Long)

  /** Batch form against a FROZEN boilerplate set — the equivalence
    * baseline for the stream (and q_boilerplate_strip's operator when
    * `set` is the corpus's own [[TextAnalytics.boilerSet]] output). */
  def stripBatch(docs: DataFrame, set: DataFrame,
                 n: Int = StripN): DataFrame =
    TextAnalytics.exciseRuns(docs,
      TextAnalytics.boilerRunFrameFrom(docs, set, n), n.toLong,
      carry = Seq("source"))

  /** The streaming strip: one base row per doc (carrying its text) plus
    * one row per boilerplate-hit position from the stream-static join,
    * collapsed per doc_id through a flatMapGroupsWithState that never
    * writes state. The collapse is [[SpanKernel.excise]] — the shared
    * row-local mirror of the batch islands→pack→excise chain. */
  def stripStream(docs: DataFrame, set: DataFrame,
                  n: Int = StripN): Dataset[Stripped] = {
    import docs.sparkSession.implicits._
    val base = docs.select(col("doc_id"), col("source"), col("text"),
      lit(-1L).as("pos"), lit(true).as("is_base"))
    val hits = docs
      .select(col("doc_id"), col("source"),
        posexplode(NgramHashes.ngram_pos_hashes(col("text"), n))
          .as(Seq("pos", "ngh")))
      .join(set.hint("shuffle_hash"), Seq("source", "ngh"))
      .select(col("doc_id"), col("source"), lit("").as("text"),
        col("pos").cast("long").as("pos"), lit(false).as("is_base"))
    val pieces = base.unionByName(hits).as[Piece]

    def collapse(id: Long, rows: Iterator[Piece],
                 state: GroupState[Boolean]): Iterator[Stripped] = {
      val rs = rows.toList
      // doc_id is the append-only unique ingest key (the ExciseStream
      // contract): same-id rows in one micro-batch would merge both
      // texts' hit positions onto one arbitrary base — fail loudly
      require(rs.count(_.is_base) <= 1,
        s"duplicate doc_id $id within a micro-batch — the strip " +
          "stream requires the append-only unique ingest key")
      rs.find(_.is_base).map { b =>
        val (cleaned, nTokens, kept, bytesRemoved) = SpanKernel.excise(
          b.text, rs.filter(!_.is_base).map(_.pos).sorted, n)
        Stripped(id, b.source, cleaned, nTokens, kept, bytesRemoved)
      }.iterator
    }

    pieces.groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(collapse)
  }
}
