package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalytics
import graft.functions.TextAnalytics.DsirModel

/** Streaming DSIR scoring — the stateless counterpart of
  * [[graft.functions.TextAnalytics.dsirWeights]], in the same
  * index-then-serve split as [[RetrievalStream]]: the bucket weight
  * grid and selection threshold are frozen against the offline corpus
  * ([[TextAnalytics.fitDsir]]), then every arriving document is scored
  * ROW-LOCALLY — hash its unigram+bigram features, look each bucket up
  * in the literal weight grid, exact BIGINT sum, one division. No
  * shuffle, no state, no watermark: a pure map stage that runs at
  * ingest rate, which is precisely how a production pipeline gates an
  * incoming crawl against a fitted quality model (admit/hold-back at
  * the door, refit offline on a cadence).
  *
  * Scores are bitwise batch [[TextAnalytics.dsirWeights]] scores for
  * documents whose features existed at fit time; novel features score
  * the smoothed n = 0 prior ratio baked into the dense grid
  * (DsirStreamSpec proves both, plus mid-stream prefix equivalence).
  * Works identically on a batch frame — the expressions are plain
  * codegen'd columns. */
object DsirStream {

  /** (doc_id, n_feats, dsir_weight, selected) for every arriving
    * document with at least one feature — the batch output contract. */
  def scoredDocs(docs: DataFrame, m: DsirModel): DataFrame = {
    val gLit: Column = typedlit(m.g.toSeq)
    val featArr = TextAnalytics.dsirFeatureArr(col("text"))
    val bucketArr = transform(featArr, f =>
      graft.expressions.PolyHash.polyhash(f) % m.buckets)
    val gsum = aggregate(bucketArr, lit(0L),
      (acc, b) => acc + element_at(gLit, (b + lit(1L)).cast("int")))
    val nFeats = size(featArr).cast("long")
    docs
      .select(col("doc_id"), nFeats.as("n_feats"), gsum.as("gsum"))
      .filter(col("n_feats") > 0)
      .select(col("doc_id"), col("n_feats"),
        (col("gsum").cast("double") / col("n_feats")
          / lit(m.scale.toDouble)).as("dsir_weight"))
      .select(col("doc_id"), col("n_feats"), col("dsir_weight"),
        (col("dsir_weight") >= lit(m.thr)).as("selected"))
  }
}
