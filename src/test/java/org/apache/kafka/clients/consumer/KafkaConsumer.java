package org.apache.kafka.clients.consumer;

import java.util.Collection;
import java.util.LinkedHashMap;
import java.util.Map;
import java.util.Properties;
import org.apache.kafka.common.TopicPartition;
import graft.stubs.StubData;

/** Signature-contract stub (see graft.stubs.StubData). */
public class KafkaConsumer<K, V> implements Consumer<K, V> {
  public KafkaConsumer(Properties props) { StubData.consumerProps = props; }
  @Override public Map<TopicPartition, Long> beginningOffsets(
      Collection<TopicPartition> partitions) {
    Map<TopicPartition, Long> m = new LinkedHashMap<>();
    for (TopicPartition tp : partitions) m.put(tp, StubData.lo);
    return m;
  }
  @Override public Map<TopicPartition, Long> endOffsets(
      Collection<TopicPartition> partitions) {
    Map<TopicPartition, Long> m = new LinkedHashMap<>();
    for (TopicPartition tp : partitions) m.put(tp, StubData.hi);
    return m;
  }
  @Override public void close() { StubData.consumerClosed = true; }
}
