package org.apache.kafka.clients.admin;

import java.util.List;
import java.util.Set;
import org.apache.kafka.common.TopicPartitionInfo;
import org.apache.kafka.common.acl.AclOperation;

/** Signature-contract stub (see graft.stubs.StubData). */
public class TopicDescription {
  private final String name;
  private final List<TopicPartitionInfo> partitions;
  private final Set<AclOperation> authorizedOperations;
  TopicDescription(String name, List<TopicPartitionInfo> partitions,
                   Set<AclOperation> authorizedOperations) {
    this.name = name;
    this.partitions = partitions;
    this.authorizedOperations = authorizedOperations;
  }
  public String name() { return name; }
  public List<TopicPartitionInfo> partitions() { return partitions; }
  public Set<AclOperation> authorizedOperations() { return authorizedOperations; }
}
