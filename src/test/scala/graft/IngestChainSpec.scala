package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.IncrementalDedup
import graft.streaming.{AdmissionStream, ExciseStream, IngestChain}

/** The production ingest chain as ONE streaming query (r13 verdict
  * item 3): gate → excise, so only admitted documents reach the span
  * excision. Pins: (1) the chained stream == the batch composition
  * bitwise regardless of micro-batch boundaries, with ZERO retained
  * state across BOTH stateful stages; (2) restricted to the documents
  * q_incremental_excision admits, the chain's rows ARE the operator's
  * rows (per-doc independence of the shared excision body); (3) the
  * duplicate-key policy (r13 verdict item 6): a replayed key aborts
  * the strict chain loudly, while the opt-in firstWins stage dedupes
  * pre-collapse so the chain never trips the require. */
object IngestChainSpec {
  val sinkN = new java.util.concurrent.atomic.AtomicInteger(0)
}

class IngestChainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")

  private lazy val split = IncrementalDedup.splitAt(docs)
  private lazy val corpus = docs.filter(col("doc_id") <= split)
  private lazy val sigs = IncrementalDedup.sigIndex(corpus).cache()
  private lazy val exactIdx = IncrementalDedup.exactIndex(corpus).cache()
  private lazy val probe = AdmissionStream.probeTable(
    IncrementalDedup.bandRows(sigs), sigs).cache()
  private lazy val ngramIdx = IncrementalDedup.ngramIndex(corpus).cache()
  private def crawl = docs.filter(col("doc_id") > split)

  private type Row5 = (Long, String, Long, Long, Long)
  private def canon(rows: Seq[Row5]): Seq[Row5] = rows.sortBy(_._1)
  private def collect5(df: DataFrame): Seq[Row5] =
    canon(df.as[Row5].collect().toSeq)

  /** Drive the chain over MemoryStream micro-batches; returns
    * (drained rows, max total state rows observed). */
  private def runChain(batches: Seq[Seq[(Long, String, String)]],
                       dedupeKeys: Boolean): (Seq[Row5], Long) = {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val name = s"ingest_chain_sink_${IngestChainSpec.sinkN.incrementAndGet()}"
    val q = IngestChain.chainStream(
        input.toDF().toDF("doc_id", "text", "source"),
        exactIdx, probe, ngramIdx, dedupeKeys = dedupeKeys)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    var maxState = 0L
    try {
      batches.foreach { b =>
        input.addData(b)
        q.processAllAvailable()
        val st = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.map(_.numRowsTotal)).sum
        if (st > maxState) maxState = st
      }
    } finally q.stop()
    (collect5(spark.table(name)), maxState)
  }

  private lazy val chainBatchRows = collect5(
    IngestChain.chainBatch(crawl, exactIdx, probe, ngramIdx))

  test("chained gate->excise stream == the batch composition bitwise, zero state") {
    val all = crawl.select($"doc_id", $"text", $"source")
      .as[(Long, String, String)].collect()
    // uneven chunks: boundaries must not matter
    val chunks = Seq(all.take(17).toSeq, all.slice(17, 18).toSeq,
      all.drop(18).toSeq)
    val (streamed, maxState) = runChain(chunks, dedupeKeys = false)
    assert(maxState == 0,
      s"the chain retained $maxState state rows across its stages")
    assert(streamed.nonEmpty && streamed == chainBatchRows)
    // the scenario is meaningful: the gate actually drops documents
    // (the chain output is a strict subset of the crawl)…
    assert(streamed.size < crawl.count(),
      "gate dropped nothing — dead fixture for the chain composition")
    // …and the excision actually cuts spans in what passes
    assert(streamed.exists(_._5 > 0), "no admitted doc had spans excised")
  }

  test("restricted to the operator's admitted docs, chain rows == q_incremental_excision") {
    // the chain gates against the CORPUS index only (no batch-internal
    // edges — the documented online-gate contract), so its admitted set
    // can exceed the operator's; but the shared excision body is
    // per-doc, so on the intersection the rows must be bitwise equal
    val operator = collect5(
      SparkEntry.queries("q_incremental_excision")(spark, TestSpark.Sf0001))
    val opIds = operator.map(_._1).toSet
    val chainOnOp = chainBatchRows.filter(r => opIds(r._1))
    assert(opIds.subsetOf(chainBatchRows.map(_._1).toSet),
      "every operator-admitted doc must also pass the corpus-only gate")
    assert(chainOnOp == operator,
      "chain excision rows diverged from the operator on shared docs")
  }

  test("duplicate key: strict chain aborts loudly, firstWins chain never trips") {
    val all = crawl.select($"doc_id", $"text", $"source")
      .as[(Long, String, String)].collect()
    // a replayed delivery plus a conflicting same-key write in one batch
    val dupId = all.head._1
    val replayed = all.toSeq :+ all.head :+ ((dupId, "zz conflicting payload", "replay"))
    // strict: the require aborts the query and NAMES the key
    val e = intercept[Exception] {
      runChain(Seq(replayed), dedupeKeys = false)
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains(s"duplicate doc_id $dupId"),
      s"strict chain failed for the wrong reason: $msgs")
    // opt-in firstWins: completes, with the deterministic representative
    // (min by (text, source)) — equal to the batch composition over the
    // same deduped input
    val (streamed, maxState) = runChain(Seq(replayed), dedupeKeys = true)
    assert(maxState == 0)
    val deduped = replayed.groupBy(_._1).values
      .map(_.minBy(r => (r._2, r._3))).toSeq
      .toDF("doc_id", "text", "source")
    val want = collect5(IngestChain.chainBatch(deduped, exactIdx, probe, ngramIdx))
    assert(streamed == want,
      "firstWins chain diverged from the batch composition over the deduped input")
  }
}
