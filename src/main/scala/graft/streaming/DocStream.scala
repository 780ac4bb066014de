package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{TextAnalytics, TextCleaning}

/** Streaming document curation — the ingest edge of the training-data
  * pipeline as Structured Streaming: clean -> quality-gate -> stateful
  * exact dedup, one micro-batch per crawl/ingest drop.
  *
  * Dedup is first-wins keyed by content hash with EVENT-TIME TTL state
  * (the OffsetStream pattern): the state store holds one tiny entry per
  * distinct live hash, sharded across executors, checkpointable, and
  * evicted once the watermark passes the key's TTL — so state tracks the
  * dedup horizon, not all of history. At 100 TB/day the horizon is the
  * knob: a re-crawled page dedups within the window and re-enters after
  * it ages out.
  *
  * All scoring columns reuse the batch operators' expressions
  * (TextCleaning.clean, the TextAnalytics quality formula), so a doc gets
  * the same verdict whether it arrives in a batch backfill or the stream.
  */
object DocStream extends Serializable {

  case class DocIngest(doc_id: Long, text: String, lang: String,
                       source: String, event_ts: java.sql.Timestamp)

  case class CuratedDoc(doc_id: Long, content_hash: String, lang: String,
                        source: String, n_tokens: Long, quality_score: Double)

  /** Clean + score one ingest frame (streaming or batch — pure column
    * expressions, no state). */
  def scored(docs: DataFrame): DataFrame = {
    val cleaned = docs.withColumn("text", TextCleaning.clean(col("text")))
    val toks = TextAnalytics.tokens(col("text"))
    val stop = TextAnalytics.Stopwords
    cleaned
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_stop",
        size(filter(toks, t => stop.map(s => t === s).reduce(_ || _))).cast("long"))
      .withColumn("n_unique", size(array_distinct(toks)).cast("long"))
      .withColumn("quality_score",
        lit(0.4) * (lit(1.0) - col("n_stop").cast("double") / col("n_tokens"))
          + lit(0.3) * least(lit(1.0), col("n_tokens").cast("double") / lit(100.0))
          + lit(0.3) * (col("n_unique").cast("double") / col("n_tokens")))
      .withColumn("content_hash", md5(col("text")))
  }

  /** The curation pipeline: quality-gate then first-wins dedup within the
    * event-time TTL window. Emits each surviving document exactly once
    * per dedup horizon. */
  def curate(docs: Dataset[DocIngest], minQuality: Double = 0.4,
             watermarkDelay: String = "60 seconds",
             ttlSeconds: Long = 3600L): Dataset[CuratedDoc] = {
    import docs.sparkSession.implicits._
    val gated = scored(docs.toDF())
      .filter(col("quality_score") >= minQuality)
      .withWatermark("event_ts", watermarkDelay)
      .select(col("doc_id"), col("content_hash"), col("lang"), col("source"),
        col("n_tokens"), col("quality_score"), col("event_ts"))
      .as[(Long, String, String, String, Long, Double, java.sql.Timestamp)]
    def update(hash: String,
               it: Iterator[(Long, String, String, String, Long, Double, java.sql.Timestamp)],
               state: GroupState[Long]): Iterator[CuratedDoc] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val rows = it.toSeq
        val out =
          if (state.exists || rows.isEmpty) Iterator.empty[CuratedDoc]
          else {
            val first = rows.minBy(r => (r._7.getTime, r._1))
            Iterator(CuratedDoc(first._1, first._2, first._3, first._4,
              first._5, first._6))
          }
        if (rows.nonEmpty) {
          val latest = rows.map(_._7.getTime).max
          state.update(latest)
          state.setTimeoutTimestamp(latest + ttlSeconds * 1000L)
        }
        out
      }
    }
    gated.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
