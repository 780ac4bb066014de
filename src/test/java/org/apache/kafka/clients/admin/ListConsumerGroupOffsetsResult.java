package org.apache.kafka.clients.admin;

import java.util.Map;
import org.apache.kafka.common.KafkaFuture;
import org.apache.kafka.common.TopicPartition;
import org.apache.kafka.clients.consumer.OffsetAndMetadata;

/** Signature-contract stub (see graft.stubs.StubData). */
public class ListConsumerGroupOffsetsResult {
  private final Map<TopicPartition, OffsetAndMetadata> offsets;
  ListConsumerGroupOffsetsResult(Map<TopicPartition, OffsetAndMetadata> offsets) {
    this.offsets = offsets;
  }
  public KafkaFuture<Map<TopicPartition, OffsetAndMetadata>> partitionsToOffsetAndMetadata() {
    return new KafkaFuture<>(offsets);
  }
}
