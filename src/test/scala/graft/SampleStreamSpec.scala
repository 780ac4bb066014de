package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Sampling
import graft.streaming.SampleStream

/** Streaming consistent sampling: the stream keeps EXACTLY the docs the
  * batch sampler keeps, regardless of how arrivals split into
  * micro-batches, with zero state. */
class SampleStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")

  test("stream sample == batch sample across arbitrary micro-batch splits") {
    implicit val sq = spark.sqlContext
    val rows = docs.select($"doc_id", $"source", $"n_chars")
      .as[(Long, String, Long)].collect().toSeq
    val input = MemoryStream[(Long, String, Long)]
    val q = SampleStream.sampled(
        input.toDF().toDF("doc_id", "source", "n_chars"))
      .writeStream.format("memory").queryName("sampled_stream")
      .outputMode("append").start()
    try {
      // three uneven micro-batches
      val (b1, rest) = rows.splitAt(37)
      val (b2, b3) = rest.splitAt(301)
      Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("sampled_stream")
        .select($"doc_id").as[Long].collect().toSet
      val batch = docs.filter(SampleStream.keep(col("doc_id")))
        .select($"doc_id").as[Long].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
      // and the per-stratum counts equal the report's `sampled` column
      val report = Sampling.stratifiedSample(docs).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("sampled")).toMap
      val bySource = docs.filter(SampleStream.keep(col("doc_id")))
        .groupBy($"source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      report.foreach { case (src, n) =>
        assert(bySource.getOrElse(src, 0L) == n, s"stratum $src")
      }
    } finally q.stop()
  }

  test("rate downsizing yields a strict subset (nested samples)") {
    val full = docs.filter(SampleStream.keep(col("doc_id")))
      .select($"doc_id").as[Long].collect().toSet
    // half the cut -> nested sample
    val halfCut = Sampling.SampleCut / 2
    val half = docs.filter(
        (pmod(col("doc_id"), lit(Sampling.M)) * Sampling.A + Sampling.B)
          % Sampling.M < halfCut)
      .select($"doc_id").as[Long].collect().toSet
    assert(half.subsetOf(full))
    assert(half.size < full.size)
  }
}
