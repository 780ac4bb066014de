package org.apache.kafka.clients.admin;

/** Signature-contract stub (see graft.stubs.StubData). */
public class ListConsumerGroupOffsetsOptions {
  private boolean requireStable;
  public ListConsumerGroupOffsetsOptions requireStable(boolean b) {
    this.requireStable = b;
    return this;
  }
  public boolean requireStable() { return requireStable; }
}
