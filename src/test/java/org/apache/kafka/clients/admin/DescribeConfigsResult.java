package org.apache.kafka.clients.admin;

import java.util.Map;
import org.apache.kafka.common.KafkaFuture;
import org.apache.kafka.common.config.ConfigResource;

/** Signature-contract stub (see graft.stubs.StubData). */
public class DescribeConfigsResult {
  private final Map<ConfigResource, Config> all;
  DescribeConfigsResult(Map<ConfigResource, Config> all) { this.all = all; }
  public KafkaFuture<Map<ConfigResource, Config>> all() { return new KafkaFuture<>(all); }
}
