package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.kafka.common.TopicPartition
import graft.sources.v2.KafkaAdminApi
import graft.app.Notifications
import graft.stubs.StubData

/** Signature-contract execution of the two reflective bindings (VERDICT
  * r3 item 3): src/test/java ships hand-written stubs with the EXACT
  * fully-qualified names and method signatures the engine's reflection
  * expects (org.apache.kafka.clients.*, software.amazon.awssdk.*, shapes
  * from the published javadocs), so every Class.forName / getMethod /
  * getConstructor in KafkaAdminApi and AwsSnsTransport actually executes
  * in CI — a typo'd reflective name fails here, not in a live deployment.
  * Collector SEMANTICS (batching, retry, ACL pruning) stay covered by
  * AdminFetcherSpec against the scripted fake; this spec only pins the
  * marshalling layer.
  */
class ReflectiveContractSpec extends AnyFunSuite {

  private def freshApi(cfg: Map[String, String] = Map(
      "bootstrap.servers" -> "broker:9092", "group.id" -> "cli-group",
      "request.timeout.ms" -> "1000")): KafkaAdminApi = {
    StubData.reset()
    StubData.topics.put("orders", 3)
    StubData.topics.put("payments", 2)
    StubData.topics.put("locked", 1)
    StubData.aclDenied.add("locked")
    StubData.configs.put("orders",
      java.util.Map.of("retention.ms", "86400000", "cleanup.policy", "delete"))
    StubData.groups.add("g1")
    StubData.groups.add("g2")
    val committed = new java.util.LinkedHashMap[TopicPartition, java.lang.Long]()
    committed.put(new TopicPartition("orders", 0), 41L)
    committed.put(new TopicPartition("orders", 1), null) // no commit -> filtered
    StubData.committed.put("g1", committed)
    StubData.lo = 7L
    StubData.hi = 99L
    StubData.brokerCount = 3
    new KafkaAdminApi(cfg, requestTimeoutMs = 1000L)
  }

  test("admin client config rules: group.id dropped, timeout floored at 60s") {
    val api = freshApi()
    api.listTopicNames() // forces admin creation
    assert(StubData.adminProps.getProperty("group.id") === null)
    assert(StubData.adminProps.getProperty("request.timeout.ms") === "60000")
    assert(StubData.adminProps.getProperty("bootstrap.servers") === "broker:9092")
  }

  test("consumer config rules: group.id kept/defaulted, byte-array deserializers") {
    val api = freshApi()
    api.watermarks("orders", 0) // forces consumer creation
    assert(StubData.consumerProps.getProperty("group.id") === "cli-group")
    assert(StubData.consumerProps.getProperty("key.deserializer")
      .endsWith("ByteArrayDeserializer"))
    val noGroup = freshApi(Map("bootstrap.servers" -> "b:9092"))
    noGroup.watermarks("orders", 0)
    assert(StubData.consumerProps.getProperty("group.id") === "graft-collector")
  }

  test("topic RPCs marshal through the real public API shapes") {
    val api = freshApi()
    assert(api.listTopicNames() === Seq("orders", "payments", "locked"))
    val metas = api.describeTopics(Seq("orders", "locked", "ghost"))
    assert(StubData.includeAuthorizedOps, "describeTopics must request ACLs")
    assert(metas.map(_.name) === Seq("orders", "locked")) // ghost absent
    assert(metas.head.partitions === Seq(0, 1, 2))
    assert(metas.head.canDescribeConfigs)
    assert(!metas(1).canDescribeConfigs, "DESCRIBE-only ACL must be detected")
    val cfg = api.describeConfigs(Seq("orders"))
    assert(cfg("orders")("retention.ms") === "86400000")
    assert(api.describeConfigs(Seq.empty) === Map.empty)
  }

  test("group RPCs marshal through the real public API shapes") {
    val api = freshApi()
    assert(api.listGroupIds() === Seq("g1", "g2"))
    val groups = api.describeGroups(Seq("g1", "g2"))
    assert(groups.map(g => (g.groupId, g.state, g.memberCount)) ===
      Seq(("g1", "Stable", 2), ("g2", "Stable", 2)))
    val offsets = api.listGroupOffsets("g1")
    assert(StubData.requireStable, "offset fetch must use require_stable")
    assert(offsets === Seq(graft.sources.v2.CommittedOffset("orders", 0, 41L)))
  }

  test("watermarks, broker count and close run the full reflective chain") {
    val api = freshApi()
    assert(api.watermarks("orders", 1) === ((7L, 99L)))
    assert(api.brokerCount() === 3)
    api.close()
    assert(StubData.adminClosed && StubData.consumerClosed)
  }

  test("sns transport builds and publishes through the real SDK shapes") {
    import software.amazon.awssdk.services.sns.SnsClient
    SnsClient.published.clear()
    val t = new Notifications.AwsSnsTransport()
    t.publish("arn:aws:sns:eu-west-1:123:reports", "subject",
      """{"default": "hello"}""", Some("json"))
    assert(SnsClient.published.size() === 1)
    val req = SnsClient.published.get(0)
    assert(req.topicArn === "arn:aws:sns:eu-west-1:123:reports")
    assert(req.subject === "subject")
    assert(req.message === """{"default": "hello"}""")
    assert(req.messageStructure === "json")
    assert(SnsClient.lastCredentialsProvider === null) // create() path

    // messageStructure omitted -> builder step skipped, field stays null
    t.publish("arn:x", "s2", "raw", None)
    assert(SnsClient.published.get(1).messageStructure === null)
  }

  test("sns role_arn path assembles the STS assume-role provider chain") {
    import software.amazon.awssdk.services.sns.SnsClient
    import software.amazon.awssdk.services.sts.auth.StsAssumeRoleCredentialsProvider
    SnsClient.published.clear()
    val t = new Notifications.AwsSnsTransport(
      roleArn = Some("arn:aws:iam::123:role/observer"))
    t.publish("arn:topic", "s", "m", None)
    assert(SnsClient.published.size() === 1)
    val provider = SnsClient.lastCredentialsProvider
      .asInstanceOf[StsAssumeRoleCredentialsProvider]
    assert(provider.refreshRequest.roleArn === "arn:aws:iam::123:role/observer")
    assert(provider.refreshRequest.roleSessionName === "KafkaOverwatch")
    assert(provider.stsClient !== null)
  }
}
