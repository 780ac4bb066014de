package org.apache.kafka.common;

/** Signature-contract stub (see graft.stubs.StubData). */
public class TopicPartitionInfo {
  private final int partition;
  public TopicPartitionInfo(int partition) { this.partition = partition; }
  public int partition() { return partition; }
}
