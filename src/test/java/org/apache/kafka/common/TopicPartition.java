package org.apache.kafka.common;

/** Signature-contract stub (see graft.stubs.StubData). */
public final class TopicPartition {
  private final String topic;
  private final int partition;
  public TopicPartition(String topic, int partition) {
    this.topic = topic;
    this.partition = partition;
  }
  public String topic() { return topic; }
  public int partition() { return partition; }
  @Override public boolean equals(Object o) {
    if (!(o instanceof TopicPartition)) return false;
    TopicPartition t = (TopicPartition) o;
    return partition == t.partition && topic.equals(t.topic);
  }
  @Override public int hashCode() { return topic.hashCode() * 31 + partition; }
  @Override public String toString() { return topic + "-" + partition; }
}
