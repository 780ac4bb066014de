package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.{FixtureCorpora, TextCleaning}
import graft.streaming.RedactStream

/** The 21st streaming twin (r12 verdict item 4): PII redaction as a
  * fully STATELESS stream — the batch operator is one row-local map
  * stage, so the stream program is the same expression over an
  * unbounded frame. Pins: (1) drained stream == batch redaction bitwise
  * regardless of micro-batch boundaries, (2) the plan carries NO state
  * operator at all (stronger than zero rows: nothing keyed exists),
  * (3) the fixture actually exercises all three PII classes, (4) a
  * re-scan of the streamed redacted text is clean. */
class RedactStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = FixtureCorpora.piiDirty(
    spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet"))

  private def canon(rows: Seq[(Long, String, Long, Long, Long)]) =
    rows.sortBy(_._1)

  private lazy val batchRows = canon(
    TextCleaning.piiRedact(docs)
      .as[(Long, String, Long, Long, Long)].collect().toSeq)

  test("drained stream == batch redaction bitwise, with no state operator") {
    implicit val sq = spark.sqlContext
    val all = docs.select($"doc_id", $"text")
      .as[(Long, String)].collect()
    val chunks = Seq(all.take(25), all.slice(25, 26), all.drop(26))
    val input = MemoryStream[(Long, String)]
    val q = RedactStream.redacted(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("redact_sink")
      .outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      assert(q.lastProgress.stateOperators.isEmpty,
        "redaction must plan as a stateless projection — no state operator")
    } finally q.stop()
    val streamed = canon(spark.table("redact_sink")
      .as[(Long, String, Long, Long, Long)].collect().toSeq)
    assert(streamed.nonEmpty && streamed == batchRows)
  }

  test("the fixture exercises all three PII classes and redaction is terminal") {
    assert(batchRows.exists(_._3 > 0), "no emails in the dirty fixture")
    assert(batchRows.exists(_._4 > 0), "no phones in the dirty fixture")
    assert(batchRows.exists(_._5 > 0), "no IPs in the dirty fixture")
    // terminal: a second scan over the redacted text finds nothing —
    // the streamed output is training-safe as-is
    val rescan = TextCleaning.piiRedact(
        batchRows.map(r => (r._1, r._2)).toDF("doc_id", "text"))
      .agg(sum(col("emails")) + sum(col("phones")) + sum(col("ips")))
      .first().getLong(0)
    assert(rescan == 0L, s"redacted text still matched $rescan PII patterns")
  }
}
