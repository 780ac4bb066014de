package graft.sources.v2

import java.util.Properties
import scala.jdk.CollectionConverters._

/** [[AdminApi]] bound to a real `org.apache.kafka.clients.admin.Admin` +
  * `KafkaConsumer` — REFLECTIVELY, because the engine ships no Kafka
  * dependency (the library is pure Spark; a deployment drops
  * `org.apache.kafka:kafka-clients` on the classpath to go live, the way
  * RemotePut relies on whatever Hadoop FS implementations are present).
  *
  * Client construction mirrors the reference's factories
  * (kafka_resources/__init__.py:23-46): the admin client drops `group.id`
  * and floors `request.timeout.ms` at 60 s regardless of config; the
  * consumer defaults `group.id` when absent. Offsets are fetched with
  * require_stable semantics (groups.py:160-164).
  *
  * Every RPC maps 1:1 onto an [[AdminApi]] method, so the collector
  * semantics (batching, ACL pruning, concurrency) live entirely in
  * [[AdminFetcher]] where they are unit-tested against a scripted fake —
  * this class is only marshalling.
  */
class KafkaAdminApi(config: Map[String, String],
                    requestTimeoutMs: Long = 60000L) extends AdminApi {

  /** The one classloading seam (overridable in tests so the
    * absent-classpath failure mode stays testable even with the
    * signature-contract stubs on the test classpath). */
  protected def forName(name: String): Class[_] = Class.forName(name)

  private def cls(name: String): Class[_] =
    try forName(name)
    catch {
      case e: ClassNotFoundException => throw new IllegalStateException(
        s"kafka-clients is not on the classpath (while loading $name); " +
          "add org.apache.kafka:kafka-clients to run the live collector — " +
          "the engine itself carries no Kafka dependency", e)
    }

  private def call(target: AnyRef, method: String,
                   args: (Class[_], AnyRef)*): AnyRef = {
    val m = target.getClass.getMethod(method, args.map(_._1): _*)
    m.setAccessible(true) // concrete classes (KafkaAdminClient) are public
    m.invoke(target, args.map(_._2): _*)
  }
  private def callIface(target: AnyRef, iface: Class[_], method: String,
                        args: (Class[_], AnyRef)*): AnyRef =
    iface.getMethod(method, args.map(_._1): _*)
      .invoke(target, args.map(_._2): _*)
  private def get(future: AnyRef): AnyRef = call(future, "get")

  private val collectionCls = classOf[java.util.Collection[_]]

  /** Admin config: no group.id, request.timeout.ms floored at 60 s. */
  private def adminProps: Properties = {
    val p = new Properties()
    (config - "group.id").foreach { case (k, v) => p.setProperty(k, v) }
    p.setProperty("request.timeout.ms",
      math.max(requestTimeoutMs, 60000L).toString)
    p
  }
  /** Consumer config: group.id defaulted when absent; byte-array
    * deserializers (watermark calls never deserialize a record). */
  private def consumerProps: Properties = {
    val p = new Properties()
    config.foreach { case (k, v) => p.setProperty(k, v) }
    if (!config.contains("group.id")) p.setProperty("group.id", "graft-collector")
    val bad = "org.apache.kafka.common.serialization.ByteArrayDeserializer"
    p.setProperty("key.deserializer", bad)
    p.setProperty("value.deserializer", bad)
    p
  }

  private lazy val adminCls = cls("org.apache.kafka.clients.admin.AdminClient")
  private lazy val admin: AnyRef =
    adminCls.getMethod("create", classOf[Properties])
      .invoke(null, adminProps)
  private lazy val consumer: AnyRef =
    cls("org.apache.kafka.clients.consumer.KafkaConsumer")
      .getConstructor(classOf[Properties]).newInstance(consumerProps)
      .asInstanceOf[AnyRef]

  private def topicPartition(topic: String, partition: Int): AnyRef =
    cls("org.apache.kafka.common.TopicPartition")
      .getConstructor(classOf[String], classOf[Int])
      .newInstance(topic, Int.box(partition)).asInstanceOf[AnyRef]

  override def listTopicNames(): Seq[String] = {
    val result = call(admin, "listTopics")
    get(call(result, "names")).asInstanceOf[java.util.Set[String]]
      .asScala.toSeq
  }

  override def describeTopics(names: Seq[String]): Seq[TopicMeta] = {
    val optsCls = cls("org.apache.kafka.clients.admin.DescribeTopicsOptions")
    val opts = optsCls.getConstructor().newInstance().asInstanceOf[AnyRef]
    call(opts, "includeAuthorizedOperations",
      classOf[Boolean] -> Boolean.box(true))
    val result = call(admin, "describeTopics",
      collectionCls -> names.asJavaCollection, optsCls -> opts)
    val byName = get(call(result, "allTopicNames"))
      .asInstanceOf[java.util.Map[String, AnyRef]].asScala
    names.flatMap(byName.get).map { desc =>
      val parts = call(desc, "partitions")
        .asInstanceOf[java.util.List[AnyRef]].asScala
        .map(tpi => call(tpi, "partition").asInstanceOf[Integer].intValue())
      // authorizedOperations() is null unless requested; the ACL bit is
      // the enum named DESCRIBE_CONFIGS (topics.py:106-117)
      val ops = Option(call(desc, "authorizedOperations"))
        .map(_.asInstanceOf[java.util.Set[AnyRef]].asScala.map(_.toString))
        .getOrElse(Set.empty[String])
      TopicMeta(call(desc, "name").asInstanceOf[String], parts.toSeq,
        ops.exists(_ == "DESCRIBE_CONFIGS"))
    }
  }

  private def configResource(topic: String): AnyRef = {
    val crCls = cls("org.apache.kafka.common.config.ConfigResource")
    val typeCls = cls("org.apache.kafka.common.config.ConfigResource$Type")
    val topicType = typeCls.getMethod("valueOf", classOf[String])
      .invoke(null, "TOPIC")
    crCls.getConstructors.find(_.getParameterCount == 2).get
      .newInstance(topicType, topic).asInstanceOf[AnyRef]
  }

  override def describeConfigs(topics: Seq[String]): Map[String, Map[String, String]] = {
    if (topics.isEmpty) return Map.empty
    val resources = topics.map(configResource)
    val result = call(admin, "describeConfigs",
      collectionCls -> resources.asJavaCollection)
    get(call(result, "all"))
      .asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala.map {
        case (res, cfg) =>
          val name = call(res, "name").asInstanceOf[String]
          val entries = call(cfg, "entries")
            .asInstanceOf[java.util.Collection[AnyRef]].asScala.map { e =>
              call(e, "name").asInstanceOf[String] ->
                call(e, "value").asInstanceOf[String]
            }.toMap
          name -> entries
      }.toMap
  }

  override def listGroupIds(): Seq[String] = {
    val result = call(admin, "listConsumerGroups")
    get(call(result, "all"))
      .asInstanceOf[java.util.Collection[AnyRef]].asScala
      .map(l => call(l, "groupId").asInstanceOf[String]).toSeq
  }

  override def describeGroups(ids: Seq[String]): Seq[GroupMeta] = {
    val result = call(admin, "describeConsumerGroups",
      collectionCls -> ids.asJavaCollection)
    val byId = get(call(result, "all"))
      .asInstanceOf[java.util.Map[String, AnyRef]].asScala
    ids.flatMap(byId.get).map { d =>
      GroupMeta(call(d, "groupId").asInstanceOf[String],
        call(d, "state").toString,
        call(d, "members").asInstanceOf[java.util.Collection[_]].size())
    }
  }

  override def listGroupOffsets(groupId: String): Seq[CommittedOffset] = {
    val optsCls = cls("org.apache.kafka.clients.admin.ListConsumerGroupOffsetsOptions")
    val opts = optsCls.getConstructor().newInstance().asInstanceOf[AnyRef]
    call(opts, "requireStable", classOf[Boolean] -> Boolean.box(true))
    val result = call(admin, "listConsumerGroupOffsets",
      classOf[String] -> groupId, optsCls -> opts)
    get(call(result, "partitionsToOffsetAndMetadata"))
      .asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala.collect {
        case (tp, om) if om != null =>
          CommittedOffset(call(tp, "topic").asInstanceOf[String],
            call(tp, "partition").asInstanceOf[Integer].intValue(),
            call(om, "offset").asInstanceOf[java.lang.Long].longValue())
      }.toSeq
  }

  override def watermarks(topic: String, partition: Int): (Long, Long) = {
    val tp = topicPartition(topic, partition)
    val tps = java.util.Collections.singleton(tp).asInstanceOf[java.util.Collection[AnyRef]]
    val consumerIface = cls("org.apache.kafka.clients.consumer.Consumer")
    val lo = callIface(consumer, consumerIface, "beginningOffsets",
      collectionCls -> tps).asInstanceOf[java.util.Map[AnyRef, java.lang.Long]]
    val hi = callIface(consumer, consumerIface, "endOffsets",
      collectionCls -> tps).asInstanceOf[java.util.Map[AnyRef, java.lang.Long]]
    (lo.values().asScala.head.longValue(), hi.values().asScala.head.longValue())
  }

  override def brokerCount(): Int = {
    val result = call(admin, "describeCluster")
    get(call(result, "nodes")).asInstanceOf[java.util.Collection[_]].size()
  }

  override def close(): Unit = {
    try call(admin, "close") catch { case _: Exception => () }
    try callIface(consumer,
      cls("org.apache.kafka.clients.consumer.Consumer"), "close")
    catch { case _: Exception => () }
  }
}

/** Factory shipping only the (serializable) config map to executors. */
case class KafkaAdminApiFactory(config: Map[String, String],
                                requestTimeoutMs: Long = 60000L)
    extends AdminApiFactory {
  override def make(): AdminApi = new KafkaAdminApi(config, requestTimeoutMs)
}
