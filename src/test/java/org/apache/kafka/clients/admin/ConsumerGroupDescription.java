package org.apache.kafka.clients.admin;

import java.util.Collection;

/** Signature-contract stub (see graft.stubs.StubData). */
public class ConsumerGroupDescription {
  private final String groupId;
  private final String state;
  private final Collection<Object> members;
  ConsumerGroupDescription(String groupId, String state, Collection<Object> members) {
    this.groupId = groupId;
    this.state = state;
    this.members = members;
  }
  public String groupId() { return groupId; }
  public Object state() { return state; }
  public Collection<Object> members() { return members; }
}
