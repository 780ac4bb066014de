package graft

import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2._

/** The live-collector semantics, driven against a scripted fake admin:
  * batched describes, ACL-aware config pruning, broker-count-bounded
  * watermark concurrency, per-group offset sweep amortized across
  * topics, and failed-partition skip — the behaviors of the reference's
  * collector loop (kafka_resources/topics.py:55-208, groups.py:111-170)
  * that DataSourceV2Spec's FixtureFetcher cannot exercise. */
class AdminFetcherSpec extends AnyFunSuite {

  /** Scripted AdminApi recording every RPC. */
  class FakeAdmin extends AdminApi {
    val describeTopicBatches = mutable.ArrayBuffer.empty[Seq[String]]
    val describeConfigBatches = mutable.ArrayBuffer.empty[Seq[String]]
    val groupOffsetCalls = mutable.ArrayBuffer.empty[String]
    val watermarkCalls = mutable.ArrayBuffer.empty[(String, Int)]
    val concurrent = new AtomicInteger(0)
    @volatile var maxConcurrent = 0
    var failPartitions: Set[Int] = Set.empty

    val topics = Map(
      "t1" -> TopicMeta("t1", 0 until 8, canDescribeConfigs = true),
      "t2" -> TopicMeta("t2", Seq(0), canDescribeConfigs = false))

    override def listTopicNames(): Seq[String] = Seq("t2", "t1")
    override def describeTopics(names: Seq[String]): Seq[TopicMeta] = {
      describeTopicBatches += names
      names.flatMap(topics.get)
    }
    override def describeConfigs(ts: Seq[String]): Map[String, Map[String, String]] = {
      describeConfigBatches += ts
      ts.map(t => t -> Map("retention.ms" -> "604800000")).toMap
    }
    override def listGroupIds(): Seq[String] = Seq("g2", "g1")
    override def describeGroups(ids: Seq[String]): Seq[GroupMeta] =
      ids.map(g => GroupMeta(g, "STABLE", 3))
    override def listGroupOffsets(g: String): Seq[CommittedOffset] = {
      groupOffsetCalls += g
      Seq(CommittedOffset("t1", 0, 10L), CommittedOffset("t2", 0, 20L))
    }
    override def watermarks(topic: String, partition: Int): (Long, Long) = {
      watermarkCalls.synchronized { watermarkCalls += ((topic, partition)) }
      if (failPartitions.contains(partition))
        throw new RuntimeException(s"watermark RPC failed for $partition")
      val cur = concurrent.incrementAndGet()
      maxConcurrent = math.max(maxConcurrent, cur)
      Thread.sleep(25)
      concurrent.decrementAndGet()
      (partition.toLong, partition.toLong + 100)
    }
    override def brokerCount(): Int = 2
  }

  def fetcherOf(fake: FakeAdmin): AdminFetcher =
    new AdminFetcher(new AdminApiFactory { def make(): AdminApi = fake },
      cluster = "live", clock = () => 777L)

  test("fetch: one batched describe, watermark concurrency capped at broker count") {
    val fake = new FakeAdmin
    val rows = fetcherOf(fake).fetch("t1")
    assert(fake.describeTopicBatches == Seq(Seq("t1"))) // ONE describe RPC
    assert(rows.map(_.partitionId).toSeq == (0L until 8L)) // sorted
    assert(rows.forall(r => r.cluster == "live" && r.scanTs == 777L && r.s == 1L))
    assert(rows.map(r => (r.low, r.high)).toSeq ==
      (0 until 8).map(p => (p.toLong, p.toLong + 100)))
    // 8 partitions, brokerCount 2: calls overlap (pool used) but never
    // exceed the reference's max_workers=cluster_brokers_count cap
    assert(fake.maxConcurrent >= 2, "watermark fetches did not overlap")
    assert(fake.maxConcurrent <= 2, "concurrency exceeded broker count")
  }

  test("fetch skips partitions whose watermark RPC fails, keeps the rest") {
    val fake = new FakeAdmin
    fake.failPartitions = Set(3, 5)
    val rows = fetcherOf(fake).fetch("t1")
    assert(rows.map(_.partitionId).toSeq == Seq(0L, 1L, 2L, 4L, 6L, 7L))
  }

  test("fetchConfigs prunes unauthorized topics before the batched configs RPC") {
    val fake = new FakeAdmin
    val (configs, skipped) = fetcherOf(fake).fetchConfigs(Seq("t1", "t2"))
    assert(fake.describeTopicBatches == Seq(Seq("t1", "t2"))) // one describe
    assert(fake.describeConfigBatches == Seq(Seq("t1")))      // t2 ACL-pruned
    assert(configs == Map("t1" -> Map("retention.ms" -> "604800000")))
    assert(skipped == Seq("t2"))
  }

  test("group offsets: one RPC per group, amortized across every topic fetch") {
    val fake = new FakeAdmin
    val f = fetcherOf(fake)
    val t1 = f.fetchGroupOffsets("t1")
    val t2 = f.fetchGroupOffsets("t2")
    // OffsetFetch is per-group (groups.py:149-170): exactly one call per
    // group in total — the sweep is cached, not re-run per topic
    assert(fake.groupOffsetCalls.sorted == Seq("g1", "g2"))
    assert(t1.map(r => (r.grp, r.committed)).sortBy(_._1).toSeq ==
      Seq(("g1", 10L), ("g2", 10L)))
    assert(t2.map(r => (r.grp, r.committed)).sortBy(_._1).toSeq ==
      Seq(("g1", 20L), ("g2", 20L)))
    assert(t1.forall(_.topic == "t1") && t2.forall(_.topic == "t2"))
  }

  test("listTopics/listGroups sort; fetchGroup maps the describe") {
    val fake = new FakeAdmin
    val f = fetcherOf(fake)
    assert(f.listTopics() == Seq("t1", "t2"))
    assert(f.listGroups() == Seq("g1", "g2"))
    val gd = f.fetchGroup("g1")
    assert(gd.toSeq == Seq(GdRow("live", "g1", "STABLE", 3L, 777L, 1L)))
  }

  test("retry seam composes: a flaky admin recovers within policy") {
    val fake = new FakeAdmin
    var calls = 0
    val flaky = new AdminFetcher(new AdminApiFactory {
      def make(): AdminApi = new FakeAdmin {
        override def listTopicNames(): Seq[String] = {
          calls += 1
          if (calls < 3) throw new RuntimeException("broker away")
          super.listTopicNames()
        }
      }
    }, "live", () => 777L)
    val retried = new RetryingFetcher(flaky, FetchPolicy(attempts = 5, baseMs = 1L),
      sleeper = _ => ())
    assert(retried.listTopics() == Seq("t1", "t2"))
    assert(calls == 3)
  }

  test("KafkaAdminApi fails fast and clearly when kafka-clients is absent") {
    // the signature-contract stubs put real kafka FQNs on the TEST
    // classpath, so absence is simulated through the forName seam
    val api = new KafkaAdminApi(Map("bootstrap.servers" -> "localhost:9092")) {
      override protected def forName(name: String): Class[_] =
        throw new ClassNotFoundException(name)
    }
    val e = intercept[IllegalStateException] { api.listTopicNames() }
    assert(e.getMessage.contains("kafka-clients is not on the classpath"))
    assert(e.getCause.isInstanceOf[ClassNotFoundException])
  }
}
