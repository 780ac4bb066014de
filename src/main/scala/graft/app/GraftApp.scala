package graft.app

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.metrics.MetricsExposition
import graft.operators._
import graft.report.ClusterReporting
import graft.sources.Snapshots

/** Service entry point — the engine's equivalent of
  * `kafka-overwatch -c config.yaml` (reference: kafka_overwatch/cli/
  * __init__.py:71-99 -> overwatch.py:58-120). One SparkSession replaces
  * the reference's process-per-cluster + pickle/mmap plumbing; per-cluster
  * isolation is a column, parallelism is task scheduling.
  *
  * Each scheduler tick: refresh snapshots -> run the metric queries ->
  * write the Prometheus exposition; on the evaluation period: assemble the
  * cluster report JSON + DataFrame exports. Snapshot ingestion here reads
  * the deterministic fixture derivation; a live deployment swaps in an
  * AdminClient collector producing the same tables.
  *
  * Usage: GraftApp <config.yaml> <sfDir> <outDir> [ticks]
  */
object GraftApp {
  def main(args: Array[String]): Unit = {
    val Array(configPath, sfDir, outDir) = args.take(3)
    val ticks = args.lift(3).map(_.toInt).getOrElse(1)
    val config = GraftConfig.parse(Files.readString(Paths.get(configPath)))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val http = sys.env.get("GRAFT_METRICS_PORT")
      .map(p => new graft.metrics.MetricsHttpServer(p.toInt).start())
    val channelDefs: Map[String, Notifications.Channel] =
      (config.notificationChannels
        .map(ch => ch.name -> new Notifications.WebhookChannel(ch.name, ch.url)) ++
       config.snsChannels.map(ch => ch.name -> new Notifications.SnsChannel(
         ch.name, ch.topicArn, new Notifications.AwsSnsTransport(ch.roleArn),
         ch.ignoreErrors)) ++
       config.smtpChannels.map(ch => ch.name -> new Notifications.SmtpChannel(
         ch.name, ch.host, ch.port, ch.mailFrom, ch.mailTo))).toMap
    // --lake <dir>: materialize the partitioned snapshot lake once and
    // make it the app's actual IO path — scans/reports read the lake
    // (partition-pruned at file listing) instead of the in-memory
    // derivation, the way a production collector persists then queries.
    val lakeDir = args.indexOf("--lake") match {
      case i if i >= 0 && i + 1 < args.length => Some(args(i + 1))
      case _ => None
    }
    lakeDir.foreach { l =>
      graft.sources.SnapshotLake.writeWatermarks(
        Snapshots.watermarks(spark, sfDir), s"$l/watermarks")
      graft.sources.SnapshotLake.writeGroupOffsets(
        Snapshots.groupOffsets(spark, sfDir), s"$l/group_offsets")
    }
    try {
      config.clusters.foreach { c =>
        val channels = c.reporting.notificationChannels.flatMap(channelDefs.get)
        runCluster(spark, c, sfDir, outDir, ticks, http, channels, lakeDir)
      }
      // release this snapshot dir's memoized frames before moving on —
      // a long-lived service looping over dirs must not accumulate dead
      // cached blocks per (session, dir) (SparkEntry.invalidate scaladoc)
      graft.SparkEntry.invalidate(spark, sfDir)
      if (args.contains("--streaming")) runStreaming(spark, sfDir, outDir)
    } finally { http.foreach(_.stop()); spark.stop() }
  }

  /** Streaming mode: the kafka-metadata DSv2 source replayed scan-by-scan
    * through the stateful delta operator WITH state TTL (the deleted-topic
    * tidy as event-time timeout) and a real checkpoint, writing delta rows
    * to parquet — the M6 wiring (a live deployment swaps the
    * fixture-backed source for one polling AdminClient). Restarting with
    * the same outDir resumes from the checkpoint. */
  def runStreaming(spark: SparkSession, sfDir: String, outDir: String,
                   watermarkDelay: String = "60 seconds",
                   ttlSeconds: Long = 180L): Unit = {
    import spark.implicits._
    val scans = spark.readStream.format("kafka-metadata")
      .option("dir", sfDir).load()
      .select("cluster", "topic", "partition_id", "low", "high", "scan_ts")
      .as[graft.streaming.OffsetStream.WatermarkScan]
    val q = graft.streaming.OffsetStream
      .deltasWithTtl(scans, watermarkDelay, ttlSeconds)
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$outDir/stream_checkpoint")
      .option("path", s"$outDir/stream_deltas")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$outDir/stream_deltas")
    System.err.println(s"[graft] streaming mode: ${out.count()} delta rows")
  }

  def runCluster(spark: SparkSession, cluster: ClusterConfig, sfDir: String,
                 outDir: String, ticks: Int,
                 http: Option[graft.metrics.MetricsHttpServer] = None,
                 channels: Seq[Notifications.Channel] = Seq.empty,
                 lakeDir: Option[String] = None): Unit = {
    // lake mode: snapshots come from the partitioned lake (pruned reads);
    // fixture mode: from the in-memory derivation
    def wmSource() = lakeDir
      .map(l => graft.sources.SnapshotLake.readWatermarks(spark, s"$l/watermarks"))
      .getOrElse(Snapshots.watermarks(spark, sfDir))
    def goSource() = lakeDir
      .map(l => graft.sources.SnapshotLake.readGroupOffsets(spark, s"$l/group_offsets"))
      .getOrElse(Snapshots.groupOffsets(spark, sfDir))
    val loop = new Scheduler.ClusterLoop(cluster,
      sleeper = _ => (), // fixture mode: don't actually wait between ticks
      onOverrun = ms => System.err.println(
        s"[graft] ${cluster.name}: scan overran interval by ${ms}ms"))

    // collector-latency Summaries (reference monitoring/prometheus.py:17-28):
    // observed around the snapshot fetch/derivation of each scan
    val topicsLatency = new graft.metrics.LatencySummary(
      "kafka_overwatch_topics_describe_latency",
      "Time spent fetching topic watermarks per scan")
    val groupsLatency = new graft.metrics.LatencySummary(
      "kafka_overwatch_groups_describe_latency",
      "Time spent fetching consumer group offsets per scan")

    def scan(): Unit = {
      val wm = topicsLatency.time {
        val f = Scheduler.applyTopicFilters(wmSource(),
          cluster.topicIncludeRegexes, cluster.topicExcludeRegexes)
        f.count() // force the fetch/derivation inside the timed section
        f
      }
      val (go, gd) = groupsLatency.time {
        val go = goSource()
        val gd = Snapshots.groupsDim(spark, sfDir)
        go.count(); gd.count()
        (go, gd)
      }
      val labels = Seq("cluster" -> cluster.name)
      val text = MetricsExposition.exposition(
        TopicAnalytics.clusterTotals(wm, gd),
        GroupAnalytics.groupTopicLag(wm, go),
        SchemaRegistryOps.counts(Snapshots.srSubjects(spark, sfDir),
          wm.filter(org.apache.spark.sql.functions.col("s") === Snapshots.NumScans)),
        Deltas.partitionDeltas(wm),
        lagTrend = Some(GroupAnalytics.lagTrend(wm, go))) +
        topicsLatency.render(labels) + "\n" +
        groupsLatency.render(labels) + "\n"
      Files.writeString(Paths.get(s"$outDir/metrics_${cluster.name}.prom"), text)
      http.foreach(_.update(text))
    }

    def report(): Unit = {
      val wm = Scheduler.applyTopicFilters(wmSource(),
        cluster.topicIncludeRegexes, cluster.topicExcludeRegexes)
      val go = goSource()
      val gd = Snapshots.groupsDim(spark, sfDir)
      val topics = TopicAnalytics.topicsDf(wm, go, gd)
      val groups = GroupAnalytics.groupsDf(wm, go, gd)
      val gov = cluster.governance
      val rpt = ClusterReporting.clusterReport(cluster.name, topics, groups,
        Snapshots.srSubjects(spark, sfDir),
        wm.filter(org.apache.spark.sql.functions.col("s") === Snapshots.NumScans),
        java.time.Instant.now(),
        topicCompliant = if (gov.topicCompliantRegexes.nonEmpty)
          gov.topicCompliantRegexes else graft.operators.Governance.DefaultCompliant,
        topicExcluded = if (gov.topicExcludedRegexes.nonEmpty)
          gov.topicExcludedRegexes else graft.operators.Governance.DefaultExcluded,
        groupCompliant = if (gov.groupCompliantRegexes.nonEmpty)
          gov.groupCompliantRegexes else Seq("^[a-z]+$"),
        groupExcluded = if (gov.groupExcludedRegexes.nonEmpty)
          gov.groupExcludedRegexes else Seq("^g_dead"))
      val json = ClusterReporting.reportJson(rpt)
      val local = Paths.get(s"$outDir/report_${cluster.name}.json")
      Files.writeString(local, json)
      // scheme-qualified output_directory -> remote upload with retry
      // (s3a:// in production, file:// in tests) — K3
      val reportUrl = if (cluster.reporting.outputDirectory.contains("://")) {
        val dest = s"${cluster.reporting.outputDirectory}/report_${cluster.name}.json"
        graft.report.RemotePut.put(
          json.getBytes(java.nio.charset.StandardCharsets.UTF_8), dest)
        dest
      } else local.toUri.toString
      ClusterReporting.exportDf(topics, outDir, s"topics_${cluster.name}",
        cluster.reporting.exportsFormats)
      ClusterReporting.exportDf(groups, outDir, s"groups_${cluster.name}",
        cluster.reporting.exportsFormats)
      Notifications.notifyReport(channels, cluster.name,
        java.time.Instant.now().toString, reportUrl)
    }

    loop.loop(() => scan(), () => report(), Some(ticks))
  }
}
