package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic snapshot fixtures derived from the driver's parquet tables.
  *
  * The reference engine (kafka-overwatch) polls a Kafka cluster and keeps
  * successive metadata snapshots in an in-memory object graph (reference:
  * kafka_overwatch/overwatch_resources/topics.py:17-45,
  * kafka_overwatch/overwatch_resources/groups.py:19-57). This engine
  * relationalizes that model into append-only snapshot tables (FIXTURES.md
  * §A), derived deterministically from the driver's `events` table so the
  * DuckDB oracle can reproduce them with identical SQL
  * (graft.oracle.OracleSql mirrors this file expression-for-expression —
  * keep the two in sync).
  *
  * Derivation: topic = event_type, partition_id = user_id % 4. Three scans
  * (s = 1..3); scan s sees all events with event_id <= max(event_id)*s/3,
  * so the partition high watermark at scan s is that event count. The log
  * start ("low") trails at high/8, simulating retention. Edge-case rows
  * from SURVEY.md §2.10 are injected as literals: empty topics (P3/P4), a
  * stale topic (P5), a topic with no partition 0 (Q2), and a committed
  * offset of -1 (Q3).
  *
  * scan_ts is BIGINT epoch-seconds (not TIMESTAMP) for bit-exact oracle
  * parity; `s` (1..NumScans) is the scan ordinal kept as a convenience
  * column (scan_ts = Epoch0 + Step*s).
  *
  * Scale note: at production scale these tables are produced by a metadata
  * collector (one row per cluster/topic/partition/scan) and are naturally
  * partitioned by (cluster, scan_ts); every downstream analytic groups or
  * joins on a prefix of that key, so no extra shuffle is introduced here.
  */
object Snapshots {
  val NumScans = 3
  val Epoch0   = 1700000000L
  val Step     = 60L
  /** Fleet-level report name (the reporting entry covers all clusters). */
  val Cluster  = "c1"
  /** The snapshot fleet spans TWO clusters so every analytic exercises
    * real multi-cluster grouping: a topic lives on exactly one cluster,
    * assigned by a rule both engines express trivially (even-length topic
    * names -> c1, odd -> c2; the event topics split 3/2 and the injected
    * edge-case topics 3/2 under it). Groups exist on both clusters (the
    * same group name on two clusters is normal fleet reality); a group
    * with no offsets on some cluster exercises the P11 no-data guard. */
  val Clusters: Seq[String] = Seq("c1", "c2")

  def clusterOf(topic: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(length(topic) % 2 === 0, "c1").otherwise("c2")
  def clusterOfName(topic: String): String =
    if (topic.length % 2 == 0) "c1" else "c2"
  /** Topics injected as literal edge cases (not derived from events). */
  val InjectedTopics: Seq[String] =
    Seq("t_empty", "t_empty1", "t_stale", "t_nop0", "t_gone")

  /** Shared literal rows — the single source of truth for both the Spark
    * derivation below and the DuckDB oracle (graft.oracle.OracleSql builds
    * VALUES clauses from these same Seqs). */
  // (topic, partition_id, s, low, high)
  // t_gone exists only in scans 1-2: exercises the deleted-topic tidy
  // (P9) as a change feed, and keeps its SR subject "unused" vs the
  // current topic list.
  val InjectedWatermarkRows: Seq[(String, Long, Long, Long, Long)] =
    (1 to NumScans).flatMap { s =>
      Seq(
        ("t_empty", 0L, s.toLong, 0L, 0L),
        ("t_empty", 1L, s.toLong, 0L, 0L),
        ("t_empty1", 0L, s.toLong, 0L, 0L),
        ("t_stale", 0L, s.toLong, 0L, 100L),
        ("t_nop0", 1L, s.toLong, 0L, 10L * s),
        ("t_nop0", 2L, s.toLong, 0L, 20L * s))
    } ++ Seq(
      ("t_gone", 0L, 1L, 0L, 50L),
      ("t_gone", 0L, 2L, 0L, 55L))
  // (grp, topic, partition_id, committed, s)
  val InjectedGroupOffsetRows: Seq[(String, String, Long, Long, Long)] =
    (1 to NumScans).flatMap { s =>
      Seq(
        ("g_empty", "t_stale", 0L, 40L, s.toLong),
        ("g_mixed", "t_nop0", 1L, -1L, s.toLong),
        ("g_mixed", "t_nop0", 2L, 15L * s, s.toLong))
    }
  // (grp, state, member_count, s)
  val GroupDimRows: Seq[(String, String, Long, Long)] =
    (1 to NumScans).flatMap { s =>
      Seq(
        ("g_active", "STABLE", 3L, s.toLong),
        ("g_empty", "EMPTY", 0L, s.toLong),
        ("g_dead", "DEAD", 0L, s.toLong),
        ("g_mixed", "STABLE", 1L, s.toLong))
    }
  // (registry, subject, version, schema_id, schema_type, schema_string)
  val SrInjectedRows: Seq[(String, String, Long, Long, String, String)] = Seq(
    ("sr2", "click-key", 1L, 201L, "AVRO", "{}"), // click is a c2 topic
    ("sr2", "orphan-value", 1L, 202L, "JSON", "{}"),
    ("sr1", "plain_subject", 1L, 203L, "PROTOBUF", "{}"),
    ("sr1", "t_gone-value", 2L, 204L, "AVRO", "{}")) // t_gone is a c1 topic

  /** events with ts normalized to ONE internal representation — BIGINT
    * nanos since epoch — regardless of how the fixture encodes it. The
    * driver has regenerated events.parquet with different timestamp
    * widths across rounds (TIMESTAMP(NANOS), then timestamp[us]), so the
    * read is schema-adaptive:
    *  - BIGINT (a NANOS file under the nanosAsLong legacy conf, or a
    *    BenchAtScale re-write): pass-through;
    *  - TIMESTAMP / TIMESTAMP_NTZ (micros or millis files): unix_micros
    *    on the internal micros value * 1000. inferTimestampNTZ is
    *    disabled for this read so a tz-less parquet timestamp lands as
    *    TimestampType, whose internal value IS the stored micros —
    *    unix_micros is then exact and session-timezone-independent.
    * The DuckDB oracles are width-agnostic already (epoch_ns(ts)). */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType => // unreachable with the conf above; safety net
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts arrived as $other — expected BIGINT nanos or a parquet timestamp")
    }
  }

  private def events(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    eventsRaw(spark, dir)
      .select($"event_id", $"event_type".as("topic"),
        ($"user_id" % 4).as("partition_id"))
  }

  private def scansDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (1 to NumScans).map(_.toLong).toDF("s")
  }

  /** Per-session memo of derived snapshot tables: within one process the
    * driver (Verify/Bench) runs many queries over the same snapshot set;
    * deriving + persisting once turns the shared derivation into a cached
    * in-memory columnar scan for every later query. Entries live for the
    * session lifetime (bounded: a handful of tiny tables per sf dir). */
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def memoize(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    memo.getOrElseUpdate((spark, key), build.persist())

  /** Unpersist + drop every snapshot table memoized for (session, dir)
    * — every memo key ends with "|dir". Called by SparkEntry.invalidate
    * so the service loop releases a snapshot dir's cached blocks when it
    * moves on (r8 verdict item 2). */
  def invalidate(spark: SparkSession, dir: String): Unit =
    memo.keys.filter(k => k._1 == spark && k._2.endsWith("|" + dir))
      .foreach(k => memo.remove(k).foreach(_.unpersist()))

  private[graft] def cachedFrames(spark: SparkSession, dir: String): Seq[DataFrame] =
    memo.collect { case ((s, k), df) if s == spark && k.endsWith("|" + dir) => df }.toSeq

  /** All memo keys held for a session, ANY dir — the soak spec's
    * zero-net-growth probe. */
  private[graft] def memoKeyCount(spark: SparkSession): Int =
    memo.keys.count(_._1 == spark)

  /** partition_watermarks: (cluster, topic, partition_id, low, high, scan_ts, s).
    * Reference: Partition watermark fetch, kafka_overwatch/kafka_resources/topics.py:168-209. */
  def watermarks(spark: SparkSession, dir: String): DataFrame =
    memoize(spark, s"wm|$dir")(watermarksUncached(spark, dir))

  private def watermarksUncached(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Two passes over events, not three: one narrow scan for the max id,
    // one wide scan for the grouped counts; the distinct (topic,
    // partition) pairs fall out of the (tiny) grouped result for free.
    val ev    = events(spark, dir)
    val mx    = ev.agg(max($"event_id").as("maxid"))
    val scans = scansDf(spark)
    // Each event is visible from scan s_min = ceil(NumScans*e/maxid) on
    // (equivalent to e <= maxid*s div NumScans), so per-scan highs are a
    // cumulative sum over one grouped pass of events — no events x scans
    // explosion. The DuckDB oracle keeps the crossJoin formulation; the
    // two are arithmetically identical.
    val byFirstScan = ev.crossJoin(broadcast(mx))
      .withColumn("s_min",
        greatest(expr(s"(event_id * $NumScans + maxid - 1) div maxid"), lit(1L)))
      .groupBy($"topic", $"partition_id", $"s_min").agg(count(lit(1)).as("c"))
      .persist() // tiny (pairs x scans upper bound); read by both branches
    val pairs = byFirstScan.select($"topic", $"partition_id").distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"topic", $"partition_id").orderBy($"s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val derived = pairs.crossJoin(broadcast(scans))
      .join(byFirstScan.withColumnRenamed("s_min", "s"),
        Seq("topic", "partition_id", "s"), "left")
      .withColumn("high", sum(coalesce($"c", lit(0L))).over(w))
      .withColumn("low", expr("high div 8"))
      .select($"topic", $"partition_id", $"s", $"low", $"high")
    val injected = InjectedWatermarkRows
      .toDF("topic", "partition_id", "s", "low", "high")
    val out = derived.unionByName(injected)
      .select(clusterOf($"topic").as("cluster"), $"topic", $"partition_id", $"low",
        $"high", (lit(Epoch0) + lit(Step) * $"s").as("scan_ts"), $"s")
      .persist()
    out.count() // materialize, then release the intermediate
    byFirstScan.unpersist()
    out
  }

  /** group_offsets: (cluster, grp, topic, partition_id, committed, scan_ts, s).
    * Reference: committed-offset fetch, kafka_overwatch/kafka_resources/groups.py:149-170.
    * committed = -1 means "no committed offset" (groups.py:121-130, quirk Q3). */
  def groupOffsets(spark: SparkSession, dir: String): DataFrame =
    memoize(spark, s"go|$dir")(groupOffsetsUncached(spark, dir))

  private def groupOffsetsUncached(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wm   = watermarks(spark, dir)
    val base = wm.filter(!$"topic".isin(InjectedTopics: _*))
    val gActive = base.select($"cluster", lit("g_active").as("grp"), $"topic",
      $"partition_id", expr("high * 3 div 4").as("committed"), $"scan_ts", $"s")
    val gEmpty = base.select($"cluster", lit("g_empty").as("grp"), $"topic",
      $"partition_id", expr("high div 2").as("committed"), $"scan_ts", $"s")
    val injected = InjectedGroupOffsetRows
      .toDF("grp", "topic", "partition_id", "committed", "s")
      .select(clusterOf($"topic").as("cluster"), $"grp", $"topic", $"partition_id",
        $"committed", (lit(Epoch0) + lit(Step) * $"s").as("scan_ts"), $"s")
    gActive.unionByName(gEmpty).unionByName(injected)
  }

  /** groups: (cluster, grp, state, member_count, scan_ts, s).
    * Reference: ConsumerGroupDescription, kafka_overwatch/kafka_resources/groups.py:74-108.
    * is_active semantics (state not DEAD/EMPTY and members > 0):
    * overwatch_resources/groups.py:79-85. */
  def groupsDim(spark: SparkSession, dir: String): DataFrame =
    memoize(spark, s"gd|$dir")(groupsDimUncached(spark, dir))

  private def groupsDimUncached(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Clusters.flatMap(c => GroupDimRows.map { case (g, st, m, s) =>
      (c, g, st, m, Epoch0 + Step * s, s)
    }).toDF("cluster", "grp", "state", "member_count", "scan_ts", "s")
  }

  /** topic_configs: (cluster, topic, key, value, is_default) — one row per
    * config entry, relational form of Topic.config
    * (reference: overwatch_resources/topics.py:147-155). */
  def topicConfigs(spark: SparkSession, dir: String): DataFrame =
    memoize(spark, s"tc|$dir")(topicConfigsUncached(spark, dir))

  private def topicConfigsUncached(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val topics = watermarks(spark, dir).select($"cluster", $"topic").distinct()
    val keys = Seq("retention.ms", "cleanup.policy", "segment.bytes").toDF("key")
    topics.crossJoin(broadcast(keys))
      .withColumn("value",
        when($"key" === "retention.ms",
          when(length($"topic") > 5, lit("86400000")).otherwise(lit("604800000")))
          .when($"key" === "cleanup.policy",
            when($"topic" === "click", lit("compact")).otherwise(lit("delete")))
          .otherwise(lit("1073741824")))
      .withColumn("is_default",
        when($"key" === "retention.ms", length($"topic") <= 5)
          .when($"key" === "cleanup.policy", $"topic" =!= "click")
          .otherwise(lit(true)))
  }

  /** Registry serving a topic's cluster — the fleet runs TWO schema
    * registries, one per cluster (the J5 linkage made visible in the
    * fixture), under the same trivially-mirrored rule as clusterOf.
    * Subjects are still checked against the FLEET-WIDE topic list in the
    * unused-subject anti-join: the reference models one shared topic
    * namespace (reporting/schema_registry.py:22-27), and a subject is
    * "unused" only when no topic anywhere matches it. */
  def registryOf(topic: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(length(topic) % 2 === 0, "sr1").otherwise("sr2")

  /** sr_subjects: (registry, subject, version, schema_id, schema_type, schema_string).
    * Reference: Subject/Schema, kafka_overwatch/kafka_overwatch/schema_registry/schema.py:14-50.
    * One AVRO subject per event-derived topic (TopicNameStrategy `-value`)
    * on its cluster's registry (registryOf), plus literal subjects
    * exercising `-key`, orphaned, and no-suffix cases
    * for the unused-subject anti-join (reporting/schema_registry.py:22-27). */
  def srSubjects(spark: SparkSession, dir: String): DataFrame =
    memoize(spark, s"sr|$dir")(srSubjectsUncached(spark, dir))

  private def srSubjectsUncached(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val topics = watermarks(spark, dir)
      .filter(!$"topic".isin(InjectedTopics: _*))
      .select($"topic").distinct()
    // schema_id from a row-local content hash, not dense_rank over an
    // unpartitioned window (which serializes the stage to one partition);
    // offset 1000 keeps the derived id range clear of the injected 201-204.
    val derived = topics
      .withColumn("schema_id",
        lit(1000L) + graft.expressions.PolyHash.polyhash($"topic") % lit(100000L))
      .select(registryOf($"topic").as("registry"),
        concat($"topic", lit("-value")).as("subject"),
        lit(1L).as("version"), $"schema_id", lit("AVRO").as("schema_type"),
        lit("""{"type":"record","name":"r"}""").as("schema_string"))
    val injected = SrInjectedRows
      .toDF("registry", "subject", "version", "schema_id", "schema_type", "schema_string")
    derived.unionByName(injected)
  }
}
