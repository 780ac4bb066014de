package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Sketches

/** Streaming near-duplicate detection against a STATIC corpus index —
  * the production shape for deduplicating an incoming crawl against an
  * existing training set (reference: kafka_overwatch re-evaluates its
  * whole snapshot per scan; a curation pipeline wants each arriving
  * document checked incrementally instead).
  *
  * Entirely STATELESS: incoming documents get their minhash signature
  * row-locally (the MinHashSig kernel — a pure function of the text),
  * explode to 16 band rows, and stream-static equi-join the
  * pre-built corpus band index on (band, band_key). No state store, no
  * watermark, no growing anything — Spark plans the static side like
  * any batch relation (AQE broadcast at small index sizes, shuffled
  * hash join at scale), and each micro-batch is an independent batch
  * join, so streamed detections are EXACTLY the batch join's rows
  * (NearDupStreamSpec proves equality including multiplicity).
  *
  * Detections carry band multiplicity (a pair sharing k bands appears
  * k times — deduplicating inside the stream would need keyed state for
  * no semantic gain; the terminal sink's grouping collapses it, exactly
  * as the batch pair query's dropDuplicates does).
  */
object NearDupStream {

  /** The static corpus band index: (doc_id, sig, band, band_key) rows
    * for every indexed document. Build once (or load from the lake) and
    * hand to [[detections]]. */
  def bandIndex(corpus: DataFrame, n: Int = 5): DataFrame =
    Sketches.bandsOf(Sketches.minHashSignatures(corpus, n))

  /** Streaming detections of incoming docs (`doc_id`, `text`) against
    * the index: (doc_id, corpus_doc, est_jaccard) rows, one per shared
    * band, for pairs estimated >= threshold. Append output mode. */
  def detections(docs: DataFrame, index: DataFrame,
                 threshold: Double = 0.5, n: Int = 5): DataFrame =
    Sketches.bandsOf(Sketches.minHashSignatures(docs, n)).as("s")
      .join(index.as("c"),
        col("s.band") === col("c.band") && col("s.band_key") === col("c.band_key"))
      .select(col("s.doc_id").as("doc_id"), col("c.doc_id").as("corpus_doc"),
        Sketches.estJaccard("s.sig", "c.sig").as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)

  /** The static simhash band index: (doc_id, simhash, band, band_key,
    * sub_key) rows — the hamming-radius counterpart of [[bandIndex]],
    * same two-level pigeonhole keys as the batch pair query. */
  def simhashIndex(corpus: DataFrame, maxHamming: Int = 3): DataFrame =
    Sketches.simHashBands(Sketches.simHashes(corpus), maxHamming)

  /** Streaming hamming-radius detections of incoming docs against a
    * simhash index: (doc_id, corpus_doc, hamming) rows, one per shared
    * composite key, for pairs within the radius. Recall within the
    * radius is exactly 1.0 (pigeonhole twice — any in-radius pair
    * shares >= 1 (band, sub_band) key with the index). Stateless
    * stream-static equi-join, Append mode. */
  def simhashDetections(docs: DataFrame, index: DataFrame,
                        maxHamming: Int = 3): DataFrame =
    Sketches.simHashBands(Sketches.simHashes(docs), maxHamming).as("s")
      .join(index.as("c"),
        col("s.band") === col("c.band") &&
          col("s.band_key") === col("c.band_key") &&
          col("s.sub_key") === col("c.sub_key"))
      .select(col("s.doc_id").as("doc_id"), col("c.doc_id").as("corpus_doc"),
        bit_count(col("s.simhash").bitwiseXOR(col("c.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)

  /** The curation gate: `docs` minus everything with a corpus near-dup
    * >= threshold. The per-DOCUMENT verdict collapses the band rows,
    * which the streaming DSL cannot express statelessly — so this is a
    * BATCH function by design, composed inside `foreachBatch` where
    * production curation runs its per-micro-batch joins (each batch is
    * an independent batch frame there, so the streamed gate equals the
    * batch gate exactly — NearDupStreamSpec). */
  def withoutNearDups(docs: DataFrame, index: DataFrame,
                      threshold: Double = 0.5, n: Int = 5): DataFrame =
    docs.join(
      detections(docs, index, threshold, n).select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
}
