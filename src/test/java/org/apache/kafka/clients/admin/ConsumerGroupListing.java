package org.apache.kafka.clients.admin;

/** Signature-contract stub (see graft.stubs.StubData). */
public class ConsumerGroupListing {
  private final String groupId;
  public ConsumerGroupListing(String groupId) { this.groupId = groupId; }
  public String groupId() { return groupId; }
}
