package org.apache.kafka.clients.consumer;

/** Signature-contract stub (see graft.stubs.StubData). */
public class OffsetAndMetadata {
  private final long offset;
  public OffsetAndMetadata(long offset) { this.offset = offset; }
  public long offset() { return offset; }
}
