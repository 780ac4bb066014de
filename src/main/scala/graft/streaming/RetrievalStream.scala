package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextAnalytics
import graft.functions.TextAnalytics.Bm25Model

/** Streaming BM25 retrieval — the stateful counterpart of
  * [[graft.functions.TextAnalytics.bm25TopKWith]] (r8 verdict item 7:
  * the retrieval arms were the only query family without a streaming
  * twin). The production shape is INDEX-THEN-SERVE: the model (query
  * terms, idf, length prior — [[TextAnalytics.fitBm25For]]) is frozen
  * against the offline corpus, then a stream of documents is scored
  * against it and a running top-k per query is maintained.
  *
  * Two-stage plan, both stages bounded:
  *  - [[scoredHits]] is STATELESS and row-local: each arriving document
  *    is scored against every query via literal expressions built from
  *    the model (tf = a filter-count over the token array; the grid
  *    contribution is the SAME [[TextAnalytics.bm25Contribution]]
  *    expression the batch plan builds, so scores are bitwise batch
  *    scores); only documents matching >= 1 query term flow on.
  *  - [[runningTopK]] keys by query and keeps a k-bounded sorted list
  *    in [[GroupState]] — state is nQueries x k (score, doc_id) pairs
  *    no matter how many documents stream through, emitted Update-mode
  *    with a per-query version so a sink can select the latest
  *    snapshot.
  *
  * Equivalence (RetrievalStreamSpec): after the stream drains, the
  * latest per-query snapshot equals batch bm25TopKWith over the same
  * documents — ids, ranks, AND scores; and fusing the snapshot with the
  * static vector arm through Similarity.rrfFuse equals the batch
  * q_rrf_fusion composition. Ties break (score desc, doc_id asc), the
  * batch window's exact order.
  *
  * Re-delivery (r9 verdict item 3): a doc_id arriving again REPLACES
  * its entry in the k-bounded state (a later batch wins; within one
  * batch — which has no delivery order — the max-score entry wins,
  * deterministically) instead of duplicating it — at-least-once
  * transports are the streaming norm, so
  * state stays <= k DISTINCT docs per query and a re-delivered document
  * leaves the snapshot equal to batch over the distinct docs (proven in
  * RetrievalStreamSpec). One inherent k-bounded-state caveat: a doc
  * already EVICTED from the top-k cannot be restored by a lower
  * re-delivered score — eviction is irreversible, exactly as in any
  * streaming top-k. */
object RetrievalStream {

  case class Hit(query_id: Long, doc_id: Long, sg: Long)
  case class TopEntry(sg: Long, doc_id: Long)
  case class TopState(entries: List[TopEntry], ver: Long)
  case class RankedHit(query_id: Long, doc_id: Long, rank: Long,
                       score: Double, ver: Long)

  /** Row-local scoring of a (streaming or batch) document frame against
    * the frozen model: emits (query_id, doc_id, sg) for every document
    * sharing >= 1 term with the query. The per-query expression scans
    * the token array qTerms times — bounded by the model contract. */
  def scoredHits(docs: DataFrame, m: Bm25Model): DataFrame = {
    val ts = TextAnalytics.tokens(col("text"))
    val dl = size(ts).cast("long")
    val perQuery = m.queryIds.map { q =>
      val terms = m.termsOf(q)
      val tfs = terms.map(t =>
        size(filter(ts, x => x === lit(t))).cast("long"))
      val cgs = terms.zip(tfs).map { case (t, tf) =>
        when(tf > 0, TextAnalytics.bm25Contribution(lit(m.idf(t)), tf, dl, m))
          .otherwise(lit(0L))
      }
      struct(lit(q).as("query_id"),
        cgs.reduce(_ + _).as("sg"),
        tfs.map(_ > 0).reduce(_ || _).as("matched"))
    }
    docs.select(col("doc_id"), explode(array(perQuery: _*)).as("h"))
      .filter(col("h.matched"))
      .select(col("h.query_id").as("query_id"), col("doc_id"),
        col("h.sg").as("sg"))
  }

  /** Running top-k per query over the scored hit stream: k-bounded
    * sorted state, Update-mode emission of the full current snapshot
    * stamped with a monotone version. */
  def runningTopK(hits: Dataset[Hit], k: Int = 10): Dataset[RankedHit] = {
    import hits.sparkSession.implicits._
    def update(q: Long, rows: Iterator[Hit],
               state: GroupState[TopState]): Iterator[RankedHit] = {
      val prev = state.getOption.getOrElse(TopState(Nil, 0L))
      val incoming = rows.map(h => TopEntry(h.sg, h.doc_id)).toList
      // idempotent on doc_id: a re-delivered doc replaces its state
      // entry. Within ONE micro-batch Spark guarantees no row order
      // after the groupByKey shuffle (and a micro-batch carries no
      // intrinsic delivery order anyway), so the survivor must be
      // chosen by VALUE, not position: the max-score entry per doc_id —
      // deterministic under any iterator order, and identical to any
      // other choice in the at-least-once case (same payload
      // re-delivered). Across batches, the later batch still replaces.
      val latest = incoming.groupBy(_.doc_id).valuesIterator
        .map(_.maxBy(_.sg)).toList
      val reDelivered = latest.map(_.doc_id).toSet
      val merged = (prev.entries.filterNot(e => reDelivered(e.doc_id)) ++ latest)
        .sortBy(e => (-e.sg, e.doc_id)).take(k)
      val next = TopState(merged, prev.ver + 1)
      state.update(next)
      merged.iterator.zipWithIndex.map { case (e, i) =>
        RankedHit(q, e.doc_id, i + 1L,
          e.sg.toDouble / TextAnalytics.Bm25Grid.toDouble, next.ver)
      }
    }
    hits.groupByKey(_.query_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }

  /** The streaming composition: scored hits -> running top-k, as a
    * typed pipeline over a streaming docs frame with (doc_id, text). */
  def bm25TopKStream(docs: DataFrame, m: Bm25Model, k: Int = 10): Dataset[RankedHit] = {
    import docs.sparkSession.implicits._
    runningTopK(scoredHits(docs, m).as[Hit], k)
  }

  /** Latest per-query snapshot of an Update-mode RankedHit sink table —
    * the serving view a fusion layer reads (max version per query). */
  def latestSnapshot(sink: DataFrame): DataFrame = {
    // window, not a self-join: joining a memory-sink table to its own
    // aggregate trips conflicting-reference analysis on the sink view
    val perQuery = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
    sink.withColumn("maxv", max(col("ver")).over(perQuery))
      .filter(col("ver") === col("maxv"))
      .select(col("query_id"), col("doc_id"), col("rank"), col("score"))
  }
}
