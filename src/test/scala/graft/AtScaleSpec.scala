package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{AtScale, TextAnalytics}
import graft.operators.TopicAnalytics

/** The at-scale quantile toggle (VERDICT r3 item 7): flipping
  * `spark.graft.quantiles.approx` must swap every quantile built through
  * AtScale to `percentile_approx` (pinned in the analyzed plan — the
  * physical operator stays ObjectHashAggregate for BOTH forms, see the
  * AtScale scaladoc, so the expression is the honest witness), keep the
  * output schema identical, and stay within the sketch's rank-error
  * bound of the exact answer at sf0.1. The toggle defaults OFF, so the
  * DuckDB oracle keeps gating the exact path.
  */
class AtScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withApprox[A](body: => A): A = {
    spark.conf.set(AtScale.ApproxQuantilesKey, "true")
    try body finally spark.conf.unset(AtScale.ApproxQuantilesKey)
  }

  test("toggle swaps the expression, keeps the schema, bounds the error") {
    val docs = spark.read.parquet(s"${TestSpark.Sf01}/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))

    val exactDf = TextAnalytics.qualityBySource(docs)
    val exact = exactDf.collect().map(r =>
      r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(!exactDf.queryExecution.analyzed.toString().contains("percentile_approx"))

    val (approxPlan, approx) = withApprox {
      val df = TextAnalytics.qualityBySource(docs)
      assert(df.schema === exactDf.schema,
        "at-scale mode must not change the output schema")
      (df.queryExecution.analyzed.toString(),
        df.collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap)
    }
    assert(approxPlan.contains("percentile_approx"),
      s"expected percentile_approx in:\n$approxPlan")

    assert(approx.keySet === exact.keySet)
    // rank error <= n/accuracy; with n per source ~ a few hundred at
    // sf0.1 and accuracy 10000 the value error is at most a couple of
    // adjacent order statistics — bound it loosely on the [0,1] score.
    for ((src, (med, p10)) <- approx) {
      assert(math.abs(med - exact(src)._1) <= 0.02,
        s"$src median: approx $med vs exact ${exact(src)._1}")
      assert(math.abs(p10 - exact(src)._2) <= 0.02,
        s"$src p10: approx $p10 vs exact ${exact(src)._2}")
    }
  }

  test("describeStats delegates to the single-pass approx form at scale") {
    val topics = Seq((1L, 100L, 10L), (2L, 220L, 20L), (3L, 340L, 30L),
        (4L, 460L, 40L), (5L, 580L, 50L))
      .toDF("id", "total_messages", "new_messages")
    val exact = TopicAnalytics.describeStats(topics)
    val approx = withApprox(TopicAnalytics.describeStats(topics))
    assert(!exact.queryExecution.analyzed.toString().contains("percentile_approx"))
    assert(approx.queryExecution.analyzed.toString().contains("percentile_approx"))
    assert(approx.schema === exact.schema)
    // tiny input: the digest is exact here, so rows must agree outright
    val e = exact.orderBy(col("column")).collect().map(_.toSeq)
    val a = approx.orderBy(col("column")).collect().map(_.toSeq)
    assert(a === e)
  }
}
