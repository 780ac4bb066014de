package org.apache.kafka.clients.admin;

import java.util.Set;
import org.apache.kafka.common.KafkaFuture;

/** Signature-contract stub (see graft.stubs.StubData). */
public class ListTopicsResult {
  private final Set<String> names;
  ListTopicsResult(Set<String> names) { this.names = names; }
  public KafkaFuture<Set<String>> names() { return new KafkaFuture<>(names); }
}
