package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.functions.Pq
import graft.operators.{Linkage, Relational, Sampling}

/** Scale-safety plan assertions for the round-5 additions: the shapes
  * PLANS.md documents must survive refactors.
  *  - editDistancePairs: no cartesian/nested-loop product anywhere, no
  *    forced broadcast hint (AQE must be free to demote at corpus
  *    scale).
  *  - stratifiedSample: the scan reads ONLY (doc_id, source, n_chars) —
  *    text never leaves parquet — and the membership predicate leaves a
  *    single exchange (the stratum rollup).
  *  - bootstrapCi: text never read; the explode runs on the projected
  *    narrow columns.
  *  - knnPq: ONE exchange in the whole plan (the final top-k window) —
  *    nothing joins, nothing aggregates before it.
  */
class NewOpsPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def tbl(name: String) =
    spark.read.parquet(s"${TestSpark.Sf0001}/$name.parquet")
  private def docs = tbl("documents")

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("excision probe: SHUFFLE_HASH on the index side, never broadcast") {
    // r13 verdict item 4's enforcement half: the cross-crawl excision
    // probe (q_incremental_excision's join of the crawl's positional
    // n-gram stream against the corpus ngram index) must stay a
    // shuffled hash join — the index side is TOKEN-proportional, the
    // strongest never-broadcast case; an AQE broadcast promotion at a
    // momentary small size is exactly the r8 OOM class the hint pins
    // away. The bucketed-layout exchange elimination on this same join
    // is asserted separately in IncrementalDedupSpec.
    val split = graft.operators.IncrementalDedup.splitAt(docs)
    val idx = graft.operators.IncrementalDedup.ngramIndex(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") <= split))
    val probe = graft.functions.TextAnalytics.indexedRunFrame(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") > split), idx)
    val p = physical(probe)
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastExchange"), p)
  }

  test("editDistancePairs: no cartesian product, no forced broadcast") {
    val df = Linkage.editDistancePairs(tbl("customer"),
      "c_custkey", "c_name", "c_nationkey")
    val p = physical(df)
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("strategy=broadcast"))
  }

  test("stratifiedSample and bootstrapCi never read text") {
    Seq(Sampling.stratifiedSample(docs), Sampling.bootstrapCi(docs)).foreach { df =>
      val p = physical(df)
      val read = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
      assert(!read.contains("text"), read)
    }
  }

  test("stratifiedSample has exactly one exchange (the stratum rollup)") {
    val p = physical(Sampling.stratifiedSample(docs))
    val n = "Exchange".r.findAllIn(p).length
    assert(n === 1, p)
  }

  test("knnPq: the only exchange is the final top-k window") {
    val cb = Pq.trainCodebook(tbl("embeddings"))
    val df = Pq.knnPqWith(tbl("embeddings"), cb)
    val p = physical(df)
    assert("Exchange".r.findAllIn(p).length === 1, p)
    assert(!p.contains("Join"), p)
    // map-side WindowGroupLimit below the exchange
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("retentionCohorts pre-aggregates to distinct user-days before the window") {
    val df = Relational.retentionCohorts(
      Relational.eventsWithEpoch(spark, TestSpark.Sf0001))
    val plan = df.queryExecution.optimizedPlan.toString
    // the distinct (Aggregate over user_id, day) must sit BELOW the window
    val winAt = plan.indexOf("windowspecdefinition")
    val aggAt = plan.lastIndexOf("Aggregate")
    assert(winAt >= 0 && aggAt > winAt, plan)
  }
}
