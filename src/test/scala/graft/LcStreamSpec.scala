package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.LcStream
import graft.functions.CountSketch

/** Streaming linear counter: the occupied bucket set equals the batch
  * build after every prefix boundary, state stays at the bucket-array
  * geometry, and the snapshot load factor matches the batch sketch. */
class LcStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming occupancy == batch occupancy, state bounded by buckets per lang") {
    implicit val sq = spark.sqlContext
    val docsAll = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select($"lang", $"text").as[(String, String)].collect()
    val (first, second) = docsAll.splitAt(docsAll.length / 2)

    val input = MemoryStream[(String, String)]
    val q = LcStream.occupancy(input.toDF().toDF("lang", "text"))
      .writeStream.format("memory").queryName("lc_occ")
      .outputMode("update").start()
    try {
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()

      // update-mode sink appends each batch's touched buckets; the
      // occupied SET is what the sketch answers from
      val streamedOcc = spark.table("lc_occ")
        .select($"lang", $"bucket").distinct()
      val batchDocs = spark.createDataset(docsAll).toDF("lang", "text")
      val batchOcc = batchDocs
        .select($"lang", explode(split($"text", " ")).as("token"))
        .select($"lang", CountSketch.lcBucket($"token").as("bucket"))
        .distinct()
      assert(streamedOcc.as[(String, Long)].collect().toSet ===
        batchOcc.as[(String, Long)].collect().toSet)

      val nLangs = batchDocs.select($"lang").distinct().count()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= CountSketch.LcBuckets * nLangs,
        s"state rows $stateRows exceed the bucket-array geometry")

      // snapshot load factor matches the batch sketch's occupied column
      val streamedLf = LcStream.loadFactor(streamedOcc)
        .select($"lang", $"occupied", $"load_factor")
        .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val batchLf = CountSketch.distinctSketch(batchDocs)
        .select($"lang", $"occupied", $"load_factor")
        .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(streamedLf === batchLf)
    } finally q.stop()
  }
}
