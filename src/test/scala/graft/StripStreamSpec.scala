package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.{FixtureCorpora, TextAnalytics}
import graft.streaming.StripStream

/** The 20th streaming twin (r12 verdict item 4): boilerplate strip
  * against a FROZEN (versioned) per-source boilerplate set. Pins:
  * (1) drained stream == batch strip bitwise regardless of micro-batch
  * boundaries, with ZERO retained state (the collapse never writes
  * state), (2) the batch form against the corpus's own detect output ==
  * the q_boilerplate_strip operator (the composition that ties the twin
  * to the oracle gate), (3) the fixture exercises both stripped and
  * untouched documents. */
class StripStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = FixtureCorpora.templated(
    spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet"))

  private lazy val frozenSet = TextAnalytics.boilerSet(docs).cache()

  private def canon(rows: Seq[(Long, String, String, Long, Long, Long)]) =
    rows.sortBy(_._1)

  private lazy val batchRows = canon(
    StripStream.stripBatch(docs, frozenSet)
      .select(col("doc_id"), col("source"), col("cleaned_text"),
        col("n_tokens"), col("kept_tokens"), col("bytes_removed"))
      .as[(Long, String, String, Long, Long, Long)].collect().toSeq)

  test("drained stream == batch strip bitwise, with zero retained state") {
    implicit val sq = spark.sqlContext
    val all = docs.select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    // uneven chunks: results must not depend on batch boundaries
    val chunks = Seq(all.take(30), all.slice(30, 31), all.drop(31))
    val input = MemoryStream[(Long, String, String)]
    val q = StripStream.stripStream(
        input.toDF().toDF("doc_id", "source", "text"), frozenSet)
      .writeStream.format("memory").queryName("strip_sink")
      .outputMode("update").start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 0,
        s"strip retained $stateRows state rows — the collapse must not keep state")
    } finally q.stop()
    val streamed = canon(spark.table("strip_sink")
      .as[(Long, String, String, Long, Long, Long)].collect().toSeq)
    assert(streamed.nonEmpty && streamed == batchRows)
  }

  test("batch form over the corpus's own detect output == the operator") {
    val operator = canon(
      TextAnalytics.boilerplateStrip(docs, carry = Seq("source"))
        .select(col("doc_id"), col("source"), col("cleaned_text"),
          col("n_tokens"), col("kept_tokens"), col("bytes_removed"))
        .as[(Long, String, String, Long, Long, Long)].collect().toSeq)
    assert(operator == batchRows,
      "stripBatch(frozen detect output) diverged from boilerplateStrip")
  }

  test("the fixture exercises both stripped and untouched documents") {
    val stripped = batchRows.count(_._6 > 0)
    val untouched = batchRows.count(_._6 == 0)
    assert(stripped > 0, "no document was stripped — dead fixture")
    assert(untouched > 0, "every document was stripped — degenerate fixture")
    // a stripped doc's cleaned text must not retain the header template
    batchRows.filter(r => r._1 % 2 == 0).foreach { r =>
      assert(!r._3.contains("all rights reserved contact us"),
        s"doc ${r._1} kept the injected header after strip")
    }
  }
}
