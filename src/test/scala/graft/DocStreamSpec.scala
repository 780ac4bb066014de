package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.DocStream
import graft.streaming.DocStream.DocIngest

/** Streaming curation: quality gate, cross-batch first-wins dedup, and
  * TTL eviction (re-admission after the horizon). */
class DocStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over a lazy dog and then runs far away home " +
      "while the careful owl watches every move of the evening hunt below"
  private def doc(id: Long, text: String, ts: Long) =
    DocIngest(id, text, "en", "web", new Timestamp(ts * 1000L))

  test("curate: gates quality, dedups across micro-batches, TTL re-admits") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[DocIngest]
    val q = DocStream.curate(input.toDS(), minQuality = 0.4,
      watermarkDelay = "0 seconds", ttlSeconds = 300L)
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      // batch 1: one good doc, one junk doc (repeated stopword -> low score)
      input.addData(Seq(doc(1L, good, 1000L),
        doc(2L, "the the the the the the", 1000L)))
      q.processAllAvailable()
      // batch 2: exact duplicate content of doc 1 -> suppressed by state
      input.addData(Seq(doc(3L, good, 1100L)))
      q.processAllAvailable()
      // batch 3: advance the watermark past the TTL, then re-send: re-admitted
      input.addData(Seq(doc(4L, "fresh unique words keep the watermark moving " +
        "along nicely toward the eviction point of this test", 1500L)))
      q.processAllAvailable()
      input.addData(Seq(doc(5L, good, 1510L)))
      q.processAllAvailable()
      val ids = spark.table("curated").select("doc_id").as[Long].collect().toSet
      assert(ids.contains(1L), "first good doc emitted")
      assert(!ids.contains(2L), "junk doc gated by quality score")
      assert(!ids.contains(3L), "duplicate suppressed within the TTL window")
      assert(ids.contains(4L), "watermark-driver doc emitted")
      assert(ids.contains(5L), "duplicate re-admitted after TTL eviction")
    } finally q.stop()
  }

  test("scored verdicts match the batch quality operator") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val streamScore = DocStream.scored(docs)
      .select($"doc_id", $"quality_score").as[(Long, Double)].collect().toMap
    val batchScore = graft.functions.TextAnalytics.qualityScores(docs)
      .select($"doc_id", $"quality_score").as[(Long, Double)].collect().toMap
    assert(streamScore === batchScore) // fixture corpus is already clean
  }
}
