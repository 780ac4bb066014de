package graft

import org.scalatest.funsuite.AnyFunSuite

/** Multi-dir service soak (r9 verdict item 4): the long-lived service
  * shape the r8 cache-lifecycle fix exists for is a loop over SNAPSHOT
  * DIRS — scan/report a dir, run analyst queries against it, invalidate,
  * move on. CacheLifecycleSpec proves ONE invalidate releases
  * everything; this spec proves the LOOP is leak-free: after >= 3
  * iterations across dirs, cached storage blocks and memo-key counts
  * show zero net growth (each iteration ends exactly where it began).
  */
class ServiceSoakSpec extends AnyFunSuite {
  // isolated session: the shared TestSpark session's memos belong to
  // concurrently running suites and must not be invalidated here
  private lazy val s = {
    val ns = TestSpark.spark.newSession()
    TestSpark.spark.conf.getAll.foreach { case (k, v) =>
      if (ns.conf.isModifiable(k)) ns.conf.set(k, v)
    }
    ns
  }

  test("the GraftApp dir loop holds caches and memo keys at zero net growth") {
    // cached RDD blocks are CONTEXT-global (shared with other suites
    // running in this JVM), so the probe is the session-scoped memo-key
    // count plus the session's own cached frames — the exact resources
    // the r8 leak accumulated.
    val dirs = Seq(TestSpark.Sf0001, TestSpark.Sf001, TestSpark.Sf0001)
    val out = java.nio.file.Files.createTempDirectory("graft-soak").toString
    val cfg = app.ClusterConfig("soak")
    val baselineKeys = SparkEntry.memoKeyCount(s)
    val perIteration = dirs.zipWithIndex.map { case (dir, i) =>
      // the GraftApp.main cadence: scan/report ticks, then a couple of
      // analyst queries against the same dir (the memo-heavy families),
      // then invalidate before moving to the next dir
      app.GraftApp.runCluster(s, cfg, dir, out, ticks = 2)
      SparkEntry.queries("q_topics_stats")(s, dir).collect()
      SparkEntry.queries("q_cosine_neardups")(s, dir).collect()
      SparkEntry.queries("q_bm25_topk")(s, dir).collect()
      assert(SparkEntry.memoKeyCount(s) > baselineKeys,
        s"iteration $i: expected the queries to populate memos")
      SparkEntry.invalidate(s, dir)
      val frames = SparkEntry.cachedFrames(s, dir)
      assert(frames.isEmpty,
        s"iteration $i left ${frames.size} cached frames for $dir")
      SparkEntry.memoKeyCount(s)
    }
    // zero NET growth: every iteration returns to the pre-loop key count
    assert(perIteration.forall(_ == baselineKeys),
      s"memo keys grew across iterations: baseline=$baselineKeys, " +
        s"per-iteration=${perIteration.mkString(",")}")
    // and the report/metrics outputs actually got produced each pass
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/report_soak.json")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/metrics_soak.prom")))
  }
}
