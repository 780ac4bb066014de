package org.apache.kafka.common;

/** Signature-contract stub (see graft.stubs.StubData). */
public class Node {
  private final int id;
  public Node(int id) { this.id = id; }
  public int id() { return id; }
}
