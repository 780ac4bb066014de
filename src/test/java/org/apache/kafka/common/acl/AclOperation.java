package org.apache.kafka.common.acl;

/** Signature-contract stub (see graft.stubs.StubData). */
public enum AclOperation {
  READ, WRITE, DESCRIBE, DESCRIBE_CONFIGS, ALTER, DELETE
}
