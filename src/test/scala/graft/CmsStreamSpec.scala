package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.CmsStream
import graft.functions.CountSketch

/** Streaming CMS: cells equal the batch build over the same documents
  * after every prefix boundary, state stays at the sketch's fixed
  * geometry, and probes never underestimate. */
class CmsStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming cells == batch cells, state bounded by Depth*Width") {
    implicit val sq = spark.sqlContext
    val docsAll = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val (first, second) = docsAll.splitAt(docsAll.length / 2)

    val input = MemoryStream[(Long, String)]
    val q = CmsStream.cells(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode("update").start()
    try {
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()

      // update-mode sink appends each batch's changed rows; cells only
      // grow, so the latest value per key is the max
      val streamed = spark.table("cms_cells")
        .groupBy($"row_i", $"bucket").agg(max($"cell").as("cell"))
        .as[(Int, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      val batch = CountSketch.cmsCells(
        spark.createDataset(docsAll).toDF("doc_id", "text"))
        .as[(Int, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      assert(streamed === batch)

      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= CountSketch.Depth * CountSketch.Width,
        s"state rows $stateRows exceed the sketch geometry")
    } finally q.stop()
  }

  test("probe estimates never fall below exact counts") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val cells = CountSketch.cmsCells(docs)
    val exact = docs
      .select(explode(split($"text", " ")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"token").limit(10)
    val est = CmsStream.probe(cells, exact.select($"token"))
      .as[(String, Long)].collect().toMap
    exact.as[(String, Long)].collect().foreach { case (tok, cnt) =>
      assert(est(tok) >= cnt, s"probe underestimated $tok")
    }
  }
}
