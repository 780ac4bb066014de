package org.apache.kafka.common;

/** Signature-contract stub (see graft.stubs.StubData). */
public class KafkaFuture<T> {
  private final T value;
  public KafkaFuture(T value) { this.value = value; }
  public T get() { return value; }
}
