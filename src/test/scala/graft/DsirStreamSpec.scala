package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.functions.TextAnalytics
import graft.streaming.DsirStream

/** Streaming DSIR (index-then-serve): the frozen model scores an
  * arriving document stream row-locally; drained output must equal the
  * batch operator BITWISE on the fit corpus, and novel features must
  * score the smoothed prior, not crash or zero out. */
class DsirStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
  private lazy val model = TextAnalytics.fitDsir(docs)

  private def batchRows = TextAnalytics.dsirWeights(docs)
    .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
    .toMap

  test("drained stream == batch dsirWeights, bitwise, on the fit corpus") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val served = DsirStream.scoredDocs(
      input.toDF().toDF("doc_id", "text"), model)
    val q = served.writeStream.format("memory").queryName("dsir_served")
      .outputMode("append").start()
    try {
      val all = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      val (first, rest) = all.splitAt(all.length / 3)
      input.addData(first.toSeq)
      q.processAllAvailable()
      // mid-stream: the prefix must already carry final scores (the
      // frozen-model contract — later arrivals never change a score)
      val mid = spark.table("dsir_served")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val batch = batchRows
      mid.foreach { case (id, w) => assert(w == batch(id)._2) }
      input.addData(rest.toSeq)
      q.processAllAvailable()
      val drained = spark.table("dsir_served")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
        .toMap
      assert(drained.keySet == batch.keySet)
      drained.foreach { case (id, row) =>
        assert(row == batch(id), s"doc $id stream $row != batch ${batch(id)}")
      }
    } finally q.stop()
  }

  test("novel serve-time features score the smoothed n=0 prior") {
    val novelText = "zzqx9 vvkm7" // tokens (and their bigram) unseen at fit
    val out = DsirStream.scoredDocs(
      Seq((9999L, novelText)).toDF("doc_id", "text"), model)
      .collect()
    assert(out.length == 1)
    val (n, w) = (out(0).getLong(1), out(0).getDouble(2))
    assert(n == 3L) // 2 unigrams + 1 bigram
    // all three features land in fit-empty buckets iff w equals the
    // prior exactly; at minimum the score is positive and bounded by it
    val prior = {
      val b = model.buckets
      val feats = Seq("zzqx9", "vvkm7", "zzqx9 vvkm7")
      val seen = feats.map(f =>
        (graft.expressions.PolyHash.hash(f.getBytes("UTF-8")) % b).toInt)
      seen.map(model.g(_)).sum.toDouble / 3 / model.scale.toDouble
    }
    assert(w == prior && w > 0.0)
  }

  test("serve plan is shuffle-free (a pure map stage)") {
    val plan = DsirStream.scoredDocs(docs.select($"doc_id", $"text"), model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"serve path must not shuffle:\n$plan")
  }
}
