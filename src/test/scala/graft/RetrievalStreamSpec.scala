package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.{Similarity, TextAnalytics}
import graft.streaming.RetrievalStream

/** Streaming retrieval twin (r8 verdict item 7): after the corpus
  * drains through the stream, the latest per-query top-k snapshot must
  * equal batch BM25 over the same documents — ids, ranks, AND bitwise
  * scores — with state bounded at nQueries x k; and fusing the snapshot
  * with the static vector arm reproduces batch q_rrf_fusion exactly. */
class RetrievalStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")

  private lazy val model = TextAnalytics.fitBm25For(docs,
    docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("text"))).get

  private def streamedSnapshot(queryName: String): org.apache.spark.sql.DataFrame = {
    implicit val sq = spark.sqlContext
    val all = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    // three uneven chunks: snapshots must converge regardless of where
    // micro-batch boundaries fall
    val chunks = Seq(all.take(100), all.slice(100, 101), all.drop(101))
    val input = MemoryStream[(Long, String)]
    val q = RetrievalStream.bm25TopKStream(
        input.toDF().toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName(queryName)
      .outputMode("update").start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= model.queryIds.size,
        s"state rows $stateRows exceed the query count (k-bounded lists)")
    } finally q.stop()
    RetrievalStream.latestSnapshot(spark.table(queryName))
  }

  test("streamed top-k snapshot == batch bm25 (ids, ranks, bitwise scores)") {
    val streamed = streamedSnapshot("retr_sink")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._3)).toSeq
    val batch = TextAnalytics.bm25TopKWith(docs, model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._3)).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("mid-stream snapshots are the batch answer over the seen prefix") {
    implicit val sq = spark.sqlContext
    val all = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    val (first, rest) = all.splitAt(all.length / 3)
    val input = MemoryStream[(Long, String)]
    val q = RetrievalStream.bm25TopKStream(
        input.toDF().toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName("retr_prefix")
      .outputMode("update").start()
    try {
      input.addData(first)
      q.processAllAvailable()
      val snap = RetrievalStream.latestSnapshot(spark.table("retr_prefix"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).sortBy(t => (t._1, t._3)).toSeq
      // the frozen model scores the PREFIX corpus — identical to batch
      // ranking of the same prefix against the same model (serve-time
      // corpus growth never re-fits the index; that is the contract)
      val prefixDf = spark.createDataset(first.toSeq).toDF("doc_id", "text")
      val batchPrefix = TextAnalytics.bm25TopKWith(prefixDf, model)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).sortBy(t => (t._1, t._3)).toSeq
      assert(snap.nonEmpty && snap == batchPrefix)
      input.addData(rest)
      q.processAllAvailable()
    } finally q.stop()
  }

  test("snapshot fused with the static vector arm == batch q_rrf_fusion") {
    val emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val streamed = streamedSnapshot("retr_fuse")
    val fusedStream = Similarity.rrfFuse(streamed,
        Similarity.knnLshMultiProbe(emb))
      .collect().map(_.toSeq).sortBy(_.toString)
    val fusedBatch = Similarity.rrfFuse(
        TextAnalytics.bm25TopKWith(docs, model),
        Similarity.knnLshMultiProbe(emb))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(fusedStream.nonEmpty && fusedStream.toSeq == fusedBatch.toSeq)
  }
}
