package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.IncrementalDedup
import graft.streaming.ExciseStream

/** The 22nd streaming twin: cross-crawl span excision against the
  * FROZEN corpus-to-date n-gram index (q_incremental_excision's apply
  * body at the door). Pins: (1) drained stream == batch excision
  * bitwise regardless of micro-batch boundaries, with ZERO retained
  * state, (2) the batch form over the gate-admitted subset == the
  * q_incremental_excision operator (the composition that ties the twin
  * to the oracle gate), (3) the fixture's dup structure crosses the
  * split, so real spans are excised. */
class ExciseStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")

  private lazy val split = IncrementalDedup.splitAt(docs)
  private lazy val ngramIdx =
    IncrementalDedup.ngramIndex(docs.filter(col("doc_id") <= split)).cache()
  private def crawl = docs.filter(col("doc_id") > split)

  private def canon(rows: Seq[(Long, String, Long, Long, Long)]) =
    rows.sortBy(_._1)

  private lazy val batchRows = canon(
    ExciseStream.exciseBatch(crawl, ngramIdx)
      .as[(Long, String, Long, Long, Long)].collect().toSeq)

  test("drained stream == batch excision bitwise, with zero retained state") {
    implicit val sq = spark.sqlContext
    val all = crawl.select($"doc_id", $"text").as[(Long, String)].collect()
    // uneven chunks: results must not depend on batch boundaries
    val chunks = Seq(all.take(35), all.slice(35, 36), all.drop(36))
    val input = MemoryStream[(Long, String)]
    val q = ExciseStream.exciseStream(
        input.toDF().toDF("doc_id", "text"), ngramIdx)
      .writeStream.format("memory").queryName("excise_sink")
      .outputMode("update").start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 0,
        s"excision retained $stateRows state rows — the collapse must not keep state")
    } finally q.stop()
    val streamed = canon(spark.table("excise_sink")
      .as[(Long, String, Long, Long, Long)].collect().toSeq)
    assert(streamed.nonEmpty && streamed == batchRows)
  }

  test("batch form over the admitted subset == the q_incremental_excision operator") {
    val admitted = crawl.join(
      IncrementalDedup.incrementalRun(docs, split)
        .filter(col("outcome") === "admitted").select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val composed = canon(ExciseStream.exciseBatch(admitted, ngramIdx)
      .as[(Long, String, Long, Long, Long)].collect().toSeq)
    val operator = canon(
      SparkEntry.queries("q_incremental_excision")(spark, TestSpark.Sf0001)
        .as[(Long, String, Long, Long, Long)].collect().toSeq)
    assert(composed.nonEmpty && composed == operator,
      "exciseBatch(gate-admitted docs) diverged from q_incremental_excision")
  }

  test("the fixture's dup structure crosses the split") {
    val excised = batchRows.count(_._5 > 0)
    val untouched = batchRows.count(_._5 == 0)
    assert(excised > 0, "no cross-crawl span excised — dead fixture")
    assert(untouched > 0, "every crawl doc was cut — degenerate fixture")
    assert(batchRows.length == crawl.count(),
      "excision must emit one row per crawl doc (untouched docs included)")
  }
}
