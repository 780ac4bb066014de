package org.apache.kafka.clients.admin;

import java.util.Collection;
import org.apache.kafka.common.KafkaFuture;
import org.apache.kafka.common.Node;

/** Signature-contract stub (see graft.stubs.StubData). */
public class DescribeClusterResult {
  private final Collection<Node> nodes;
  DescribeClusterResult(Collection<Node> nodes) { this.nodes = nodes; }
  public KafkaFuture<Collection<Node>> nodes() { return new KafkaFuture<>(nodes); }
}
