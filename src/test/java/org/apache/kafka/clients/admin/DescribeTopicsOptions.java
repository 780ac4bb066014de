package org.apache.kafka.clients.admin;

/** Signature-contract stub (see graft.stubs.StubData). */
public class DescribeTopicsOptions {
  private boolean includeAuthorizedOperations;
  public DescribeTopicsOptions includeAuthorizedOperations(boolean b) {
    this.includeAuthorizedOperations = b;
    return this;
  }
  public boolean includeAuthorizedOperations() { return includeAuthorizedOperations; }
}
