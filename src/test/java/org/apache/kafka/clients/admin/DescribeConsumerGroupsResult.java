package org.apache.kafka.clients.admin;

import java.util.Map;
import org.apache.kafka.common.KafkaFuture;

/** Signature-contract stub (see graft.stubs.StubData). */
public class DescribeConsumerGroupsResult {
  private final Map<String, ConsumerGroupDescription> byId;
  DescribeConsumerGroupsResult(Map<String, ConsumerGroupDescription> byId) { this.byId = byId; }
  public KafkaFuture<Map<String, ConsumerGroupDescription>> all() {
    return new KafkaFuture<>(byId);
  }
}
