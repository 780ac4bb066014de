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

  test("lag percentiles and bootstrap CI swap expressions, keep schema, stay close") {
    val wm = graft.sources.Snapshots.watermarks(spark, TestSpark.Sf001)
    val go = graft.sources.Snapshots.groupOffsets(spark, TestSpark.Sf001)
    val exactLag = graft.operators.GroupAnalytics.lagPercentiles(wm, go)
    val approxLag = withApprox(
      graft.operators.GroupAnalytics.lagPercentiles(wm, go))
    assert(!exactLag.queryExecution.analyzed.toString().contains("percentile_approx"))
    assert(approxLag.queryExecution.analyzed.toString().contains("percentile_approx"))
    assert(approxLag.schema === exactLag.schema)
    val e = exactLag.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(3), r.getLong(5))).toMap
    val a = approxLag.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(a.keySet === e.keySet)
    // group sizes here are far below the digest's 1/accuracy rank
    // budget, so the approx p50 is an exact nearest-rank order
    // statistic; it can differ from the interpolated exact p50 by at
    // most half the gap between the two middle values <= range/2
    for ((k, v) <- a) assert(math.abs(v - e(k)._1) <= e(k)._2 / 2.0 + 1.0,
      s"$k p50: approx $v vs exact ${e(k)._1}")

    val docs = spark.read.parquet(s"${TestSpark.Sf001}/documents.parquet")
    val exactCi = graft.operators.Sampling.bootstrapCi(docs)
    val approxCi = withApprox(graft.operators.Sampling.bootstrapCi(docs))
    assert(approxCi.queryExecution.analyzed.toString().contains("percentile_approx"))
    assert(approxCi.schema === exactCi.schema)
    val eCi = exactCi.collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    val aCi = approxCi.collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(aCi.keySet === eCi.keySet)
    // 64 replicate means per stratum: the digest holds them all, but the
    // estimators differ (interpolated vs nearest-rank) — bound by the
    // spread between adjacent replicate means
    for ((src, (lo, hi)) <- aCi) {
      assert(math.abs(lo - eCi(src)._1) <= math.abs(eCi(src)._2 - eCi(src)._1),
        s"$src ci_lo drifted: $lo vs ${eCi(src)._1}")
      assert(math.abs(hi - eCi(src)._2) <= math.abs(eCi(src)._2 - eCi(src)._1),
        s"$src ci_hi drifted: $hi vs ${eCi(src)._2}")
    }
  }

  test("quality deciles at scale: window sort gone, masses within digest error") {
    val docs = spark.read.parquet(s"${TestSpark.Sf001}/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val exact = TextAnalytics.qualityDeciles(docs)
    val approx = withApprox(TextAnalytics.qualityDeciles(docs))
    assert(approx.schema === exact.schema)
    // the at-scale plan must not contain the per-source ntile window —
    // the whale-source sort is exactly what the toggle removes
    val exactPlan = exact.queryExecution.executedPlan.toString()
    val approxPlan = approx.queryExecution.executedPlan.toString()
    assert(exactPlan.contains("Window"), "exact mode should keep ntile")
    assert(!approxPlan.contains("Window"),
      s"approx mode must drop the window sort:\n$approxPlan")
    // cut semantics vs rank semantics: every document still lands in
    // exactly one decile, per-source totals match, and each decile's
    // mass is within one digest error of n/10
    val eTot = exact.groupBy(col("source")).agg(sum(col("docs")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val aRows = approx.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val aTot = aRows.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    assert(aTot === eTot, "approx deciles must partition each source exactly")
    for (((src, d), n) <- aRows) {
      val expect = eTot(src) / 10.0
      assert(math.abs(n - expect) <= math.max(2.0, expect * 0.5),
        s"$src decile $d mass $n vs ~$expect")
      assert(d >= 1L && d <= 10L)
    }
  }

  test("minhash calibration p50 routes through the switchboard (r6 item 3)") {
    // the candidate-PAIR set is where group cardinality grows
    // superlinearly with corpus size — the last exact-percentile bypass
    val q = SparkEntry.queries("q_minhash_calibration")
    val exact = q(spark, TestSpark.Sf0001)
    val approx = withApprox(q(spark, TestSpark.Sf0001))
    assert(!exact.queryExecution.analyzed.toString().contains("percentile_approx"))
    assert(approx.queryExecution.analyzed.toString().contains("percentile_approx"),
      "at-scale mode must swap the calibration p50 to percentile_approx")
    assert(approx.schema === exact.schema)
    val e = exact.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val a = approx.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a.keySet === e.keySet)
    // buckets hold few pairs at sf0.001 → digest ~exact; loose bound on [0,1]
    for ((b, v) <- a) assert(math.abs(v - e(b)) <= 0.05,
      s"bucket $b p50_abs_err: approx $v vs exact ${e(b)}")
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

  test("editdist sampleMod yields exactly the full pair set on the slice") {
    // r10 verdict item 4: the slice is a true SUBSET — per-row blocking
    // means no pair inside the slice can be lost, and none outside it
    // can appear. Pin set equality, not statistics.
    import graft.operators.Linkage
    val customer = spark.read.parquet(s"${TestSpark.Sf0001}/customer.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2", "dist", "same_nation").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toSet
    val full = pairs(Linkage.editDistancePairs(customer,
      "c_custkey", "c_name", "c_nationkey"))
    val m = 3
    spark.conf.set(AtScale.EditdistSampleModKey, m.toString)
    val sampled = try pairs(Linkage.editDistancePairs(customer,
      "c_custkey", "c_name", "c_nationkey"))
    finally spark.conf.unset(AtScale.EditdistSampleModKey)
    assert(sampled == full.filter(p => p._1 % m == 0 && p._2 % m == 0),
      "sampled pair set is not the full set restricted to the id slice")
    assert(sampled.nonEmpty, "slice too aggressive for the fixture")
    assert(sampled.size < full.size, "sampling did not reduce the pair set")
  }

  test("calibration sampleMod keeps the error curve, cuts the pair mass") {
    // r10 verdict item 4: the CURVE (per-bucket p50 error) is the
    // product; the pair roster is not. Sampled buckets must exist in
    // the exact curve with bounded p50 deltas and ~1/m of the mass.
    def curve() = SparkEntry.queries("q_minhash_calibration")(
        spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = curve()
    val m = 4
    spark.conf.set(AtScale.CalibrationSampleModKey, m.toString)
    val sampled = try curve()
    finally spark.conf.unset(AtScale.CalibrationSampleModKey)
    assert(sampled.keySet.subsetOf(exact.keySet))
    val (exactN, sampledN) = (exact.values.map(_._1).sum,
      sampled.values.map(_._1).sum)
    assert(sampledN <= exactN / 2,
      s"sampling left $sampledN of $exactN pairs")
    assert(sampledN >= exactN / (4L * m),
      s"slice lost too much mass: $sampledN of $exactN at mod $m")
    for ((b, (n, p50)) <- sampled if n >= 20)
      assert(math.abs(p50 - exact(b)._2) <= 0.05,
        s"bucket $b p50 drifted: sampled $p50 vs exact ${exact(b)._2}")
  }
}
