package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.HllStream
import graft.functions.CountSketch

/** Streaming HLL: registers equal the batch build over the same
  * documents after every prefix boundary, state stays at the register
  * geometry, and the snapshot estimate is bit-identical to batch. */
class HllStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming registers == batch registers, state bounded by m per lang") {
    implicit val sq = spark.sqlContext
    val docsAll = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select($"lang", $"text").as[(String, String)].collect()
    val (first, second) = docsAll.splitAt(docsAll.length / 2)

    val input = MemoryStream[(String, String)]
    val q = HllStream.registers(input.toDF().toDF("lang", "text"))
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode("update").start()
    try {
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()

      // update-mode sink appends each batch's raised registers;
      // registers only ratchet up, so the latest value per key is the max
      val streamed = spark.table("hll_regs")
        .groupBy($"lang", $"bucket").agg(max($"m").as("m"))
      val streamedMap = streamed
        .as[(String, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap

      val batchDocs = spark.createDataset(docsAll).toDF("lang", "text")
      val batch = CountSketch.hllTokenUpdates(batchDocs)
        .groupBy($"lang", $"bucket").agg(max($"rho").as("m"))
        .as[(String, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
      assert(streamedMap === batch)

      val nLangs = batchDocs.select($"lang").distinct().count()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= CountSketch.HllM * nLangs,
        s"state rows $stateRows exceed the register geometry")

      // snapshot estimate matches the batch report's raw_est exactly
      // (same integer-grid sum, same trailing IEEE division)
      val streamedEst = HllStream.estimate(streamed)
        .select($"lang", $"raw_est")
        .as[(String, Double)].collect().toMap
      val batchEst = CountSketch.hllDistinct(batchDocs)
        .select($"lang", $"raw_est")
        .as[(String, Double)].collect().toMap
      assert(streamedEst === batchEst)
    } finally q.stop()
  }
}
