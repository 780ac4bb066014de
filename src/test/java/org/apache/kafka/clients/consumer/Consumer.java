package org.apache.kafka.clients.consumer;

import java.util.Collection;
import java.util.Map;
import org.apache.kafka.common.TopicPartition;

/** Signature-contract stub (see graft.stubs.StubData): only the methods
  * the engine binds through this interface. */
public interface Consumer<K, V> {
  Map<TopicPartition, Long> beginningOffsets(Collection<TopicPartition> partitions);
  Map<TopicPartition, Long> endOffsets(Collection<TopicPartition> partitions);
  void close();
}
