package graft.sources.v2

import java.util.concurrent.{Callable, Executors, TimeUnit}
import scala.jdk.CollectionConverters._

/** Topic metadata from one batched describe: partition ids plus whether
  * this principal may DescribeConfigs it (the ACL bit the reference reads
  * off `authorized_operations`, kafka_resources/topics.py:106-117). */
case class TopicMeta(name: String, partitions: Seq[Int],
                     canDescribeConfigs: Boolean)
case class GroupMeta(groupId: String, state: String, memberCount: Int)
case class CommittedOffset(topic: String, partition: Int, committed: Long)

/** The minimal admin/consumer RPC surface the collector needs — one
  * method per Kafka RPC, batch-shaped exactly like the protocol:
  * describeTopics/describeConfigs/describeGroups take the WHOLE batch in
  * one call (one RPC each), while listGroupOffsets is per-group because
  * the OffsetFetch API takes a single group id
  * (kafka_resources/groups.py:149-170 "no support for list of CGs").
  *
  * Implementations: [[KafkaAdminApi]] binds to a real
  * org.apache.kafka.clients.admin.AdminClient reflectively (the engine
  * ships no Kafka dependency); tests script a fake. */
trait AdminApi extends AutoCloseable {
  def listTopicNames(): Seq[String]
  /** One batched describe-topics RPC (include_authorized_operations). */
  def describeTopics(names: Seq[String]): Seq[TopicMeta]
  /** One batched describe-configs RPC — callers must pre-filter to
    * authorized topics. */
  def describeConfigs(topics: Seq[String]): Map[String, Map[String, String]]
  def listGroupIds(): Seq[String]
  /** One batched describe-groups RPC. */
  def describeGroups(ids: Seq[String]): Seq[GroupMeta]
  /** Per-group committed offsets, require_stable=true semantics. */
  def listGroupOffsets(groupId: String): Seq[CommittedOffset]
  /** Consumer get_watermark_offsets for one partition: (low, high). */
  def watermarks(topic: String, partition: Int): (Long, Long)
  /** Broker count — sizes the per-topic fetch concurrency, like the
    * reference's ThreadPoolExecutor(max_workers=cluster_brokers_count)
    * (topics.py:143-145). */
  def brokerCount(): Int
  override def close(): Unit = ()
}

/** Serializable factory so the fetcher can ship to executors and bind
  * its (non-serializable) client lazily, once per JVM. */
trait AdminApiFactory extends Serializable { def make(): AdminApi }

/** Live AdminClient-backed [[WatermarkFetcher]] — the engine counterpart
  * of the reference's collector loop (kafka_resources/topics.py:55-208,
  * groups.py:111-170), re-shaped for the DSv2 seam: the DRIVER calls only
  * listTopics/listGroups (cheap metadata RPCs at planning), and each
  * EXECUTOR's PartitionReader calls the fetch methods for its own keys.
  * Wrap in [[RetryingFetcher]] for the reference's retry schedule. */
class AdminFetcher(factory: AdminApiFactory, cluster: String,
                   clock: () => Long = () => System.currentTimeMillis())
    extends WatermarkFetcher {
  /** One client per JVM (driver for the key lists, each executor for its
    * partitions' row fetches), bound on first use after deserialization. */
  @transient private lazy val api: AdminApi = factory.make()

  /** Live mode serves the CURRENT snapshot: one scan, s = 1. History
    * accumulates via SnapshotLake appends, not inside the fetcher. */
  val LiveScan = 1L

  override def listTopics(): Seq[String] = api.listTopicNames().sorted
  override def listGroups(): Seq[String] = api.listGroupIds().sorted

  /** One topic's watermark rows: one batched describe for the partition
    * list, then per-partition watermark RPCs on a pool bounded by the
    * broker count — the reference's exact concurrency cap, so a large
    * topic can't stampede a small cluster (topics.py:143-145). A partition
    * whose watermark call fails after the seam's retries is SKIPPED, not
    * fatal — the reference continues on (None, None) (topics.py:195-197). */
  override def fetch(topic: String): Array[WmRow] = {
    val ts = clock()
    val parts = api.describeTopics(Seq(topic)).headOption
      .map(_.partitions).getOrElse(Seq.empty)
    if (parts.isEmpty) return Array.empty
    val pool = Executors.newFixedThreadPool(
      math.max(1, math.min(api.brokerCount(), parts.size)))
    try {
      val tasks = parts.map { p =>
        new Callable[Option[WmRow]] {
          override def call(): Option[WmRow] =
            try {
              val (lo, hi) = api.watermarks(topic, p)
              Some(WmRow(cluster, topic, p.toLong, lo, hi, ts, LiveScan))
            } catch { case _: Exception => None }
        }
      }
      pool.invokeAll(tasks.asJava).asScala
        .flatMap(_.get()).sortBy(_.partitionId).toArray
    } finally { pool.shutdown(); pool.awaitTermination(60, TimeUnit.SECONDS) }
  }

  /** The OffsetFetch API is per-group, so serving a per-TOPIC partition
    * means sweeping every group once — done lazily ONCE per JVM and
    * served from that cache for every topic partition this executor
    * reads (groups.py:149-170's serial per-group loop, amortized). */
  @transient private lazy val offsetsByTopic: Map[String, Array[GoRow]] = {
    val ts = clock()
    api.listGroupIds().flatMap { g =>
      api.listGroupOffsets(g).map(o =>
        GoRow(cluster, g, o.topic, o.partition.toLong, o.committed, ts, LiveScan))
    }.groupBy(_.topic).map { case (t, rs) => t -> rs.toArray }
  }

  override def fetchGroupOffsets(topic: String): Array[GoRow] =
    offsetsByTopic.getOrElse(topic, Array.empty)

  override def fetchGroup(grp: String): Array[GdRow] = {
    val ts = clock()
    api.describeGroups(Seq(grp)).map(g =>
      GdRow(cluster, g.groupId, g.state, g.memberCount.toLong, ts, LiveScan)).toArray
  }

  /** Topic-config collection with the reference's ACL-aware pruning: ONE
    * batched describe-topics, partition on the DescribeConfigs ACL bit,
    * then ONE batched describe-configs over only the authorized topics
    * (unauthorized ones are skipped, not failed —
    * topics.py:106-117,80-95). Returns (configs, skippedTopics). */
  def fetchConfigs(topics: Seq[String]): (Map[String, Map[String, String]], Seq[String]) = {
    if (topics.isEmpty) return (Map.empty, Seq.empty)
    val metas = api.describeTopics(topics)
    val (authorized, skipped) = metas.partition(_.canDescribeConfigs)
    val configs =
      if (authorized.isEmpty) Map.empty[String, Map[String, String]]
      else api.describeConfigs(authorized.map(_.name))
    (configs, skipped.map(_.name))
  }
}
