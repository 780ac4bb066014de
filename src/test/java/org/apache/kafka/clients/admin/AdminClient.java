package org.apache.kafka.clients.admin;

import java.util.*;
import java.util.stream.Collectors;
import org.apache.kafka.common.Node;
import org.apache.kafka.common.TopicPartition;
import org.apache.kafka.common.TopicPartitionInfo;
import org.apache.kafka.common.acl.AclOperation;
import org.apache.kafka.common.config.ConfigResource;
import org.apache.kafka.clients.consumer.OffsetAndMetadata;
import graft.stubs.StubData;

/**
 * Signature-contract stub: the exact public entry point the engine's
 * reflective binding loads (KafkaAdminApi). Serves scripted data from
 * graft.stubs.StubData and captures the config it is created with.
 */
public class AdminClient {
  protected AdminClient() {}

  public static AdminClient create(Properties props) {
    StubData.adminProps = props;
    return new AdminClient();
  }

  public ListTopicsResult listTopics() {
    return new ListTopicsResult(new LinkedHashSet<>(StubData.topics.keySet()));
  }

  public DescribeTopicsResult describeTopics(Collection<String> names,
                                             DescribeTopicsOptions options) {
    StubData.includeAuthorizedOps = options.includeAuthorizedOperations();
    Map<String, TopicDescription> byName = new LinkedHashMap<>();
    for (String n : names) {
      Integer parts = StubData.topics.get(n);
      if (parts == null) continue;
      List<TopicPartitionInfo> infos = new ArrayList<>();
      for (int p = 0; p < parts; p++) infos.add(new TopicPartitionInfo(p));
      Set<AclOperation> ops = null;
      if (options.includeAuthorizedOperations()) {
        ops = StubData.aclDenied.contains(n)
            ? EnumSet.of(AclOperation.DESCRIBE)
            : EnumSet.of(AclOperation.DESCRIBE, AclOperation.DESCRIBE_CONFIGS);
      }
      byName.put(n, new TopicDescription(n, infos, ops));
    }
    return new DescribeTopicsResult(byName);
  }

  public DescribeConfigsResult describeConfigs(Collection<ConfigResource> resources) {
    Map<ConfigResource, Config> all = new LinkedHashMap<>();
    for (ConfigResource r : resources) {
      Map<String, String> cfg =
          StubData.configs.getOrDefault(r.name(), Collections.emptyMap());
      all.put(r, new Config(cfg.entrySet().stream()
          .map(e -> new ConfigEntry(e.getKey(), e.getValue()))
          .collect(Collectors.toList())));
    }
    return new DescribeConfigsResult(all);
  }

  public ListConsumerGroupsResult listConsumerGroups() {
    List<ConsumerGroupListing> ls = StubData.groups.stream()
        .map(ConsumerGroupListing::new).collect(Collectors.toList());
    return new ListConsumerGroupsResult(ls);
  }

  public DescribeConsumerGroupsResult describeConsumerGroups(Collection<String> ids) {
    Map<String, ConsumerGroupDescription> byId = new LinkedHashMap<>();
    for (String id : ids) {
      if (!StubData.groups.contains(id)) continue;
      byId.put(id, new ConsumerGroupDescription(id, "Stable",
          Arrays.asList(new Object(), new Object())));
    }
    return new DescribeConsumerGroupsResult(byId);
  }

  public ListConsumerGroupOffsetsResult listConsumerGroupOffsets(
      String groupId, ListConsumerGroupOffsetsOptions options) {
    StubData.requireStable = options.requireStable();
    Map<TopicPartition, Long> raw =
        StubData.committed.getOrDefault(groupId, Collections.emptyMap());
    Map<TopicPartition, OffsetAndMetadata> out = new LinkedHashMap<>();
    for (Map.Entry<TopicPartition, Long> e : raw.entrySet())
      out.put(e.getKey(),
          e.getValue() == null ? null : new OffsetAndMetadata(e.getValue()));
    return new ListConsumerGroupOffsetsResult(out);
  }

  public DescribeClusterResult describeCluster() {
    List<Node> nodes = new ArrayList<>();
    for (int i = 0; i < StubData.brokerCount; i++) nodes.add(new Node(i));
    return new DescribeClusterResult(nodes);
  }

  public void close() { StubData.adminClosed = true; }
}
