package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.app.{GraftConfig, Scheduler}
import graft.metrics.MetricsExposition
import graft.operators.{ChangeFeed, Deltas, GroupAnalytics, TopicAnalytics}
import graft.sources.Snapshots

class AppSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val yaml =
    """global:
      |  cluster_scan_interval_in_seconds: 20
      |clusters:
      |  prod:
      |    cluster_scan_interval_in_seconds: 45
      |    topic_include_regexes: ["^prod"]
      |    topic_exclude_regexes: ["^prod_internal"]
      |    governance:
      |      topic_naming_convention:
      |        regexes: ["^[a-z]+$"]
      |    reporting_config:
      |      evaluation_period_in_seconds: 90
      |      exports:
      |        formats: [csv, json]
      |    schema_registry: main-sr
      |  staging: {}
      |schema_registries:
      |  main-sr:
      |    schema_registry_scan_interval: 120
      |""".stripMargin

  test("yaml config parses with reference defaults and validation") {
    val c = GraftConfig.parse(yaml)
    assert(c.globalScanIntervalSeconds === 20L)
    val prod = c.clusters.find(_.name == "prod").get
    assert(prod.scanIntervalSeconds === 45L)
    assert(prod.topicIncludeRegexes === Seq("^prod"))
    assert(prod.governance.topicCompliantRegexes === Seq("^[a-z]+$"))
    assert(prod.reporting.evaluationPeriodSeconds === 90L)
    assert(prod.reporting.exportsFormats === Seq("csv", "json"))
    // staging inherits the global fallback (reference config/config.py:38)
    assert(c.clusters.find(_.name == "staging").get.scanIntervalSeconds === 20L)
    assert(c.schemaRegistries === Seq(app.SchemaRegistryConfig("main-sr", 120L)))
  }

  test("config validation rejects bad input") {
    intercept[IllegalArgumentException](
      GraftConfig.parse("clusters:\n  c1:\n    cluster_scan_interval_in_seconds: 0\n"))
    intercept[IllegalArgumentException](
      GraftConfig.parse("clusters:\n  c1:\n    schema_registry: missing\n"))
    intercept[Exception](
      GraftConfig.parse("clusters:\n  c1:\n    topic_include_regexes: [\"[\"]\n"))
  }

  test("Q7: topic include/exclude filters apply at ingest") {
    import spark.implicits._
    val wm = Seq(("c1", "prod_a", 0L), ("c1", "prod_internal_x", 0L), ("c1", "other", 0L))
      .toDF("cluster", "topic", "partition_id")
    val got = Scheduler.applyTopicFilters(wm, Seq("^prod"), Seq("^prod_internal"))
      .select("topic").as[String].collect().toSet
    assert(got === Set("prod_a"))
  }

  test("scheduler: report fires on evaluation period, sleep fills the interval, overrun warns") {
    val cfg = app.ClusterConfig("c1", scanIntervalSeconds = 10L,
      reporting = app.ReportingConfig(evaluationPeriodSeconds = 25L))
    var now = 0L
    var slept = Vector.empty[Long]
    var overruns = Vector.empty[Long]
    var scans = 0; var reports = 0
    val loop = new Scheduler.ClusterLoop(cfg, () => now,
      ms => { slept :+= ms; now += ms }, o => overruns :+= o)
    def scan(): Unit = { scans += 1; now += 2000 } // scan takes 2s
    def report(): Unit = reports += 1
    loop.loop(() => scan(), () => report(), Some(4))
    assert(scans === 4)
    // reports at t=0 and t=30s (evaluation period 25s, scans every 10s)
    assert(reports === 2)
    assert(slept === Vector(8000L, 8000L, 8000L, 8000L))
    assert(overruns.isEmpty)
    // a slow scan overruns: no sleep, warning invoked
    def slowScan(): Unit = { scans += 1; now += 12000 }
    val r = loop.tick(() => slowScan(), () => report())
    assert(r.overrunMillis === 2000L && r.sleptMillis === 0L)
    assert(overruns === Vector(2000L))
  }

  test("prometheus exposition renders the reference gauge catalog") {
    val dir = TestSpark.Sf0001
    val wm = Snapshots.watermarks(spark, dir)
    val go = Snapshots.groupOffsets(spark, dir)
    val text = MetricsExposition.exposition(
      TopicAnalytics.clusterTotals(wm, Snapshots.groupsDim(spark, dir)),
      GroupAnalytics.groupTopicLag(wm, go),
      graft.operators.SchemaRegistryOps.counts(Snapshots.srSubjects(spark, dir),
        wm.filter(org.apache.spark.sql.functions.col("s") === Snapshots.NumScans)),
      Deltas.partitionDeltas(wm),
      lagTrend = Some(GroupAnalytics.lagTrend(wm, go)))
    assert(text.contains("# TYPE kafka_overwatch_cluster_topics_count gauge"))
    assert(text.contains("# TYPE kafka_overwatch_consumer_group_lag_slope gauge"))
    assert(text.contains("""kafka_overwatch_consumer_group_lag_slope{cluster="c1",grp="g_active""""))
    // the fleet spans two clusters: 5 even-length topics on c1, 4 odd on c2
    assert(text.contains("""kafka_overwatch_cluster_topics_count{cluster="c1"} 5"""))
    assert(text.contains("""kafka_overwatch_cluster_topics_count{cluster="c2"} 4"""))
    assert(text.contains("""kafka_overwatch_consumer_group_lag{cluster="c1",grp="g_active""""))
    assert(text.contains("""kafka_overwatch_consumer_group_lag{cluster="c2",grp="g_active""""))
    // two registries (sr1 serves c1, sr2 serves c2) — 9 subjects total
    assert(text.contains("""kafka_overwatch_subjects_count{registry="sr1"} 5"""))
    assert(text.contains("""kafka_overwatch_subjects_count{registry="sr2"} 4"""))
    assert(text.contains("kafka_overwatch_topic_partition_new_messages{"))
  }

  test("runCluster exposes collector latency summaries alongside the gauges") {
    val out = java.nio.file.Files.createTempDirectory("graft-app").toString
    graft.app.GraftApp.runCluster(spark, app.ClusterConfig("c1"),
      TestSpark.Sf0001, out, ticks = 2)
    val prom = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/metrics_c1.prom"))
    assert(prom.contains("# TYPE kafka_overwatch_topics_describe_latency summary"))
    assert(prom.contains("""kafka_overwatch_topics_describe_latency_count{cluster="c1"} 2"""))
    assert(prom.contains("""kafka_overwatch_topics_describe_latency_sum{cluster="c1"}"""))
    assert(prom.contains("""kafka_overwatch_groups_describe_latency_count{cluster="c1"} 2"""))
    assert(prom.contains("# TYPE kafka_overwatch_cluster_topics_count gauge"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/report_c1.json")))
  }

  test("lake mode: app IO reads the partitioned lake with pruned scans") {
    import graft.sources.SnapshotLake
    val lake = java.nio.file.Files.createTempDirectory("graft-lake-app").toString
    val out = java.nio.file.Files.createTempDirectory("graft-app-lake-out").toString
    SnapshotLake.writeWatermarks(
      Snapshots.watermarks(spark, TestSpark.Sf0001), s"$lake/watermarks")
    SnapshotLake.writeGroupOffsets(
      Snapshots.groupOffsets(spark, TestSpark.Sf0001), s"$lake/group_offsets")
    // lake round-trip is loss-free (canonical column order/types restored
    // on read; nullability legitimately widens through parquet)
    val back = SnapshotLake.readWatermarks(spark, s"$lake/watermarks")
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      Snapshots.watermarks(spark, TestSpark.Sf0001).schema
        .map(f => (f.name, f.dataType)))
    assert(back.count() === Snapshots.watermarks(spark, TestSpark.Sf0001).count())
    // the latest-scan view reads ONLY the s=<latest> partition
    // directories — partition pruning at file listing, the property that
    // holds at any history length. (inputFiles lists the whole relation;
    // pruning is a physical-plan property, so assert on the scan node's
    // pushed partition filters and its executed numFiles metric.)
    val latest = back.filter(
      org.apache.spark.sql.functions.col("s") === Snapshots.NumScans)
    latest.collect()
    val scanNode = latest.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan in the lake read plan"))
    assert(scanNode.metadata("PartitionFilters").contains(s"= ${Snapshots.NumScans}"))
    def filesUnder(p: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try s.filter(f => f.toString.endsWith(".parquet")).count() finally s.close()
    }
    val latestFiles = scanNode.metrics("numFiles").value
    assert(latestFiles > 0)
    assert(latestFiles < filesUnder(s"$lake/watermarks")) // strictly pruned
    // exactly the files living in s=<latest> directories, across clusters
    val onDiskLatest = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$lake/watermarks"))
      try s.filter(f => f.toString.endsWith(".parquet") &&
        f.toString.contains(s"/s=${Snapshots.NumScans}/")).count()
      finally s.close()
    }
    assert(latestFiles === onDiskLatest)
    // and the app runs end-to-end with the lake as its IO path
    graft.app.GraftApp.runCluster(spark, app.ClusterConfig("c1"),
      TestSpark.Sf0001, out, ticks = 1, lakeDir = Some(lake))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/report_c1.json")))
    val prom = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/metrics_c1.prom"))
    assert(prom.contains("""kafka_overwatch_cluster_topics_count{cluster="c1"} 5"""))
  }

  test("metrics HTTP endpoint serves the latest exposition") {
    val srv = new graft.metrics.MetricsHttpServer(0).start()
    try {
      srv.update("# HELP x\nx 1\n")
      val url = new java.net.URI(s"http://localhost:${srv.boundPort}/metrics").toURL
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      val body = new String(conn.getInputStream.readAllBytes())
      assert(conn.getResponseCode === 200)
      assert(conn.getContentType.startsWith("text/plain"))
      assert(body === "# HELP x\nx 1\n")
    } finally srv.stop()
  }

  test("churn feed reports the deleted topic") {
    import spark.implicits._
    val churn = ChangeFeed.topicChurn(Snapshots.watermarks(spark, TestSpark.Sf0001))
      .select("s", "change", "topic").as[(Long, String, String)].collect().toSet
    assert(churn === Set((3L, "deleted", "t_gone")))
  }
}
