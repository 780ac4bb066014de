package org.apache.kafka.clients.admin;

import java.util.Map;
import org.apache.kafka.common.KafkaFuture;

/** Signature-contract stub (see graft.stubs.StubData). */
public class DescribeTopicsResult {
  private final Map<String, TopicDescription> byName;
  DescribeTopicsResult(Map<String, TopicDescription> byName) { this.byName = byName; }
  public KafkaFuture<Map<String, TopicDescription>> allTopicNames() {
    return new KafkaFuture<>(byName);
  }
}
