package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.NearDupStream

/** Stream-static near-dup detection: streamed detections equal the
  * batch join exactly (including band multiplicity), stay stateless,
  * and find every thresholded corpus near-dup of the incoming docs. */
class NearDupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed detections == batch join, stateless, across micro-batches") {
    implicit val sq = spark.sqlContext
    val all = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select($"doc_id", $"text")
    // corpus = even doc_ids (the "existing training set"); the stream
    // delivers odd doc_ids in two micro-batches
    val corpus = all.filter($"doc_id" % 2 === 0)
    val incomingAll = all.filter($"doc_id" % 2 === 1)
      .as[(Long, String)].collect()
    val (first, second) = incomingAll.splitAt(incomingAll.length / 2)

    val index = NearDupStream.bandIndex(corpus).localCheckpoint()

    val input = MemoryStream[(Long, String)]
    val q = NearDupStream.detections(
        input.toDF().toDF("doc_id", "text"), index, threshold = 0.3)
      .writeStream.format("memory").queryName("neardup_det")
      .outputMode("append").start()
    try {
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()

      val streamed = spark.table("neardup_det")
        .as[(Long, Long, Double)].collect().sorted
      val batch = NearDupStream.detections(
          spark.createDataset(incomingAll).toDF("doc_id", "text"),
          index, threshold = 0.3)
        .as[(Long, Long, Double)].collect().sorted
      assert(streamed === batch,
        s"streamed ${streamed.length} rows != batch ${batch.length}")
      assert(batch.nonEmpty, "fixture produced no detections — test is vacuous")

      // stateless: the plan carries no stateful operator at all
      assert(q.lastProgress.stateOperators.isEmpty,
        "stream-static join should hold NO state")
    } finally q.stop()
  }

  test("streamed simhash detections == batch join, full radius recall") {
    implicit val sq = spark.sqlContext
    val all = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select($"doc_id", $"text")
    val corpus = all.filter($"doc_id" % 2 === 0)
    val incomingAll = all.filter($"doc_id" % 2 === 1)
      .as[(Long, String)].collect()
    val (first, second) = incomingAll.splitAt(incomingAll.length / 2)
    val index = NearDupStream.simhashIndex(corpus, maxHamming = 4).localCheckpoint()

    val input = MemoryStream[(Long, String)]
    val q = NearDupStream.simhashDetections(
        input.toDF().toDF("doc_id", "text"), index, maxHamming = 4)
      .writeStream.format("memory").queryName("neardup_sh")
      .outputMode("append").start()
    try {
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()

      val streamed = spark.table("neardup_sh")
        .as[(Long, Long, Int)].collect().sorted
      val batch = NearDupStream.simhashDetections(
          spark.createDataset(incomingAll).toDF("doc_id", "text"),
          index, maxHamming = 4)
        .as[(Long, Long, Int)].collect().sorted
      assert(streamed === batch)
      assert(q.lastProgress.stateOperators.isEmpty)

      // full radius recall vs brute force: every (incoming, corpus)
      // pair within hamming 4 appears among the deduplicated detections
      val fps = (graft.functions.Sketches.simHashes(all)
        .as[(Long, Long)].collect()).toMap
      val truth = (for {
        (ia, _) <- incomingAll
        ic <- fps.keys if ic % 2 == 0
        if java.lang.Long.bitCount(fps(ia) ^ fps(ic)) <= 4
      } yield (ia, ic)).toSet
      assert(streamed.map(r => (r._1, r._2)).toSet === truth)
      assert(truth.nonEmpty, "fixture produced no in-radius pairs — vacuous")
    } finally q.stop()
  }

  test("foreachBatch curation gate == batch gate across micro-batches") {
    implicit val sq = spark.sqlContext
    val all = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select($"doc_id", $"text")
    val corpus = all.filter($"doc_id" % 2 === 0)
    val incomingAll = all.filter($"doc_id" % 2 === 1)
      .as[(Long, String)].collect()
    val (first, second) = incomingAll.splitAt(incomingAll.length / 2)
    val index = NearDupStream.bandIndex(corpus).localCheckpoint()

    val survived = scala.collection.mutable.ArrayBuffer.empty[Long]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        survived ++= NearDupStream.withoutNearDups(batch, index, threshold = 0.3)
          .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
          .collect()
        ()
      }
      .start()
    try {
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()

      val batchGate = NearDupStream.withoutNearDups(
          spark.createDataset(incomingAll).toDF("doc_id", "text"),
          index, threshold = 0.3)
        .select($"doc_id").as[Long].collect()
      assert(survived.sorted === batchGate.sorted)
      assert(batchGate.length < incomingAll.length,
        "gate dropped nothing — test is vacuous")
    } finally q.stop()
  }
}
