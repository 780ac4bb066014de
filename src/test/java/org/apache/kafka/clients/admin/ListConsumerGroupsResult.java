package org.apache.kafka.clients.admin;

import java.util.Collection;
import org.apache.kafka.common.KafkaFuture;

/** Signature-contract stub (see graft.stubs.StubData). */
public class ListConsumerGroupsResult {
  private final Collection<ConsumerGroupListing> all;
  ListConsumerGroupsResult(Collection<ConsumerGroupListing> all) { this.all = all; }
  public KafkaFuture<Collection<ConsumerGroupListing>> all() { return new KafkaFuture<>(all); }
}
